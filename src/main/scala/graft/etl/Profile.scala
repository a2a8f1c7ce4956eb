package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — the ANALYZE-shape statistics pass a warehouse runs
  * before planning over new data: per-column null count, exact distinct
  * count, and min/max, one output row per column.
  *
  * Values are normalized to engine-portable strings AFTER aggregating (the
  * raw column keeps its native ordering for min/max — a lexicographic min of
  * stringified numbers would rank "10" < "9"): integers via BIGINT, floats
  * via DECIMAL(18,4) (both engines render full scale), timestamps via
  * second-precision formatting.
  *
  * Scale: one job, one shuffle. The exact multi-column distinct plans an
  * Expand (input × (ncols+1) rows before partial aggregation) — that is the
  * honest cost of exact ndv on every column in one pass; when approximation
  * is acceptable, swap `countDistinct` for `approx_count_distinct` and the
  * Expand disappears (the relational pack's q25 demonstrates the HLL path).
  */
object Profile extends Serializable {

  private def norm(dt: DataType, c: Column): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      c.cast("long").cast("string")
    case FloatType | DoubleType => c.cast(DecimalType(18, 4)).cast("string")
    case _: DecimalType => c.cast(DecimalType(18, 4)).cast("string")
    case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  /** Profile `cols` (default: every column) of `df`. Output:
    * (column, n_nulls, ndv, min_val, max_val) — one row per column, in the
    * requested order (a `pos` column keeps it stable for consumers that
    * sort).
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.isEmpty) df.columns.toSeq else cols
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    names.foreach(n => require(types.contains(n), s"no such column: $n"))

    val aggs = count(lit(1)).as("__rows") +: names.flatMap { n =>
      val c = col(n)
      val dt = types(n)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${n}__nulls"),
        countDistinct(c).as(s"${n}__ndv"),
        norm(dt, min(c)).as(s"${n}__min"),
        norm(dt, max(c)).as(s"${n}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = names.zipWithIndex.map { case (n, i) =>
      struct(lit(i.toLong).as("pos"), lit(n).as("column"),
        col("__rows").as("n_rows"),
        col(s"${n}__nulls").as("n_nulls"), col(s"${n}__ndv").as("ndv"),
        col(s"${n}__min").as("min_val"), col(s"${n}__max").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Distribution-drift gate between two profiles of the same columns (a
    * new batch/partition vs a trusted baseline): flags a column when its
    * null fraction moved more than `nullFracTol` (absolute) or its
    * distinct-count density (ndv / rows) changed by more than
    * `ndvRatioTol`× in either direction — the two cheap signals that catch
    * most schema-rot and upstream-regression incidents. Returns flagged
    * rows (column, metric, baseline, current); empty = no drift. Purely a
    * join of two |columns|-row frames — trivially broadcastable.
    */
  def drift(current: DataFrame, baseline: DataFrame,
      nullFracTol: Double = 0.05, ndvRatioTol: Double = 2.0): DataFrame = {
    require(nullFracTol >= 0 && ndvRatioTol >= 1.0,
      s"bad tolerances: $nullFracTol / $ndvRatioTol")
    def frac(a: Column, b: Column): Column =
      when(b === 0L, lit(0.0)).otherwise(a.cast("double") / b)
    val c = current.select(col("column"),
      frac(col("n_nulls"), col("n_rows")).as("nf_c"),
      frac(col("ndv"), col("n_rows")).as("dv_c"))
    val b = baseline.select(col("column"),
      frac(col("n_nulls"), col("n_rows")).as("nf_b"),
      frac(col("ndv"), col("n_rows")).as("dv_b"))
    val j = c.join(b, "column")
    val nullDrift = j
      .filter(abs(col("nf_c") - col("nf_b")) > nullFracTol)
      .select(col("column"), lit("null_fraction").as("metric"),
        col("nf_b").as("baseline"), col("nf_c").as("current"))
    val ndvDrift = j
      .filter(greatest(col("dv_c"), col("dv_b")) >
        least(col("dv_c"), col("dv_b")) * ndvRatioTol)
      .select(col("column"), lit("ndv_density").as("metric"),
        col("dv_b").as("baseline"), col("dv_c").as("current"))
    nullDrift.unionByName(ndvDrift)
  }

  /** Join/aggregation-key SKEW diagnostics — the report that says whether
    * a planned `groupBy`/`join` on `keyCols` will melt a shuffle at scale
    * and salting is warranted, BEFORE the job runs. One row:
    *
    *   (n_rows, n_keys, max_count, min_count, mean_count_micro,
    *    top1_share_micro, gini_micro)
    *
    * `gini_micro` is the exact Gini coefficient of the per-key count
    * distribution (0 = perfectly even, → 1 = one key owns everything),
    * computed with the rank identity G = (2·Σᵢ i·cᵢ − (K+1)·ΣC) / (K·ΣC)
    * over counts sorted ascending — all integer: DECIMAL(38,0) products,
    * explicit-pmod floor. Ties need no ordering contract: a tie block
    * occupies a fixed contiguous rank range, so Σ i·cᵢ is invariant
    * under any internal order (both engines may rank ties freely and
    * still agree).
    *
    * Scale shape: one key-count aggregation (map-side partial), the
    * range-partitioned exact rank ([[Transforms.globalSortRank]] — never
    * a single-partition window), and one 1-row total. NULL keys group as
    * their own key (SQL GROUP BY semantics, both engines). Empty input
    * refuses loudly — a skew report over nothing is a pipeline bug.
    */
  /** The ACTIONABLE half of [[skewReport]]: per-heavy-key salting plan.
    * Keys whose row count exceeds `targetPerKey` get
    * `salt_factor = ceil(count / targetPerKey)` — the fan-out to append
    * (`pmod(hash, salt_factor)`) on the build side and explode on the
    * probe side so no single shuffle partition receives more than
    * ~targetPerKey rows of that key. Output is heavy-keys-only (empty =
    * no salting needed); integer ceil-div, exact on any engine.
    */
  def saltPlan(df: DataFrame, keyCols: Seq[String],
      targetPerKey: Long): DataFrame = {
    require(keyCols.nonEmpty, "saltPlan needs at least one key column")
    require(targetPerKey > 0, s"targetPerKey must be positive, got " +
      s"$targetPerKey")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > targetPerKey)
      .select(keyCols.map(col) :+ col("n_rows") :+
        expr(s"(n_rows + ${targetPerKey - 1}) DIV $targetPerKey")
          .as("salt_factor"): _*)
  }

  /** APPLY a [[saltPlan]] to both sides of a planned equi-join, returning
    * the two frames extended with a `__salt` column to ADD to the join
    * keys: heavy probe keys scatter across `salt_factor` sub-keys (via a
    * caller-named deterministic per-row column — a row id — hashed with
    * xxhash64, so the scatter is reproducible across retries and
    * engines), and heavy build keys REPLICATE once per salt value
    * (`explode(sequence(...))`). Joining on `keyCols :+ "__salt"` then
    * yields EXACTLY the unsalted join's rows — light keys carry salt 0 on
    * both sides and are untouched — while no single shuffle partition
    * receives more than ~count/salt_factor rows of a heavy key. The
    * executable half of the skew story: [[skewReport]] says whether,
    * [[saltPlan]] says how much, this wires it in.
    */
  def applySaltPlan(probe: DataFrame, build: DataFrame, plan: DataFrame,
      keyCols: Seq[String], probeRowCol: String): (DataFrame, DataFrame) = {
    require(keyCols.nonEmpty, "applySaltPlan needs at least one key column")
    require(!probe.columns.contains("__salt") &&
        !build.columns.contains("__salt"),
      "inputs must not already carry __salt")
    val factors = plan.select(keyCols.map(col) :+
      col("salt_factor").as("__sf"): _*)
    val p = probe.join(broadcast(factors), keyCols, "left")
      .withColumn("__salt",
        when(col("__sf").isNull, lit(0L))
          .otherwise(pmod(xxhash64(col(probeRowCol)), col("__sf"))))
      .drop("__sf")
    val b = build.join(broadcast(factors), keyCols, "left")
      .withColumn("__salt",
        explode(sequence(lit(0L), coalesce(col("__sf"), lit(1L)) - 1)))
      .drop("__sf")
    (p, b)
  }

  def skewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "skewReport needs at least one key column")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__sk_c"))
      .select(col("__sk_c"))
    val ranked = graft.etl.Transforms.globalSortRank(counts,
      Seq(col("__sk_c")), rankCol = "__sk_i")
    val dec = DecimalType(38, 0)
    val agg = ranked.agg(
      count(lit(1)).as("n_keys"),
      coalesce(sum(col("__sk_c")), lit(0L)).as("n_rows"),
      coalesce(max(col("__sk_c")), lit(0L)).as("max_count"),
      coalesce(min(col("__sk_c")), lit(0L)).as("min_count"),
      coalesce(sum(col("__sk_i").cast(dec) * col("__sk_c").cast(dec)),
        lit(0L).cast(dec)).as("__sk_a"))
    val row = agg.head()
    require(row.getLong(0) > 0, "skewReport: empty input")
    def floorDiv(nm: Column, dn: Column): Column =
      ((nm - pmod(nm, dn)) / dn).cast("long")
    agg.select(
      col("n_rows"), col("n_keys"), col("max_count"), col("min_count"),
      floorDiv(col("n_rows").cast(dec) * lit(1000000L),
        col("n_keys").cast(dec)).as("mean_count_micro"),
      floorDiv(col("max_count").cast(dec) * lit(1000000L),
        col("n_rows").cast(dec)).as("top1_share_micro"),
      when(col("n_keys") === 1, lit(0L)).otherwise(
        floorDiv(
          (lit(2L).cast(dec) * col("__sk_a") -
            (col("n_keys").cast(dec) + lit(1L)) * col("n_rows").cast(dec)) *
            lit(1000000L),
          col("n_keys").cast(dec) * col("n_rows").cast(dec)))
        .as("gini_micro"))
  }

  /** Per-group exact Gini of a non-negative value column — the same rank
    * identity as [[skewReport]], one coefficient PER GROUP (the datacard's
    * per-language length-inequality panel: gini of per-doc token counts).
    * `tieCol` is accepted for API stability but no longer consulted:
    * since a tie block's ranks are a fixed contiguous range, Σ i·vᵢ — and
    * therefore the coefficient — is invariant under the internal tie
    * order, so the whole rank pass collapses to BLOCK arithmetic over the
    * distinct (group, value) pairs (r17, guide §2.3 "aggregate before you
    * shuffle"): one partial-aggregated shuffle counts each block's
    * multiplicity c, a range-partitioned weighted prefix sum
    * ([[Transforms.globalSortPrefixSum]] — never a per-group window
    * pinning a giant group to one task) recovers each block's starting
    * rank p within its group, and the block contributes
    * v · (p·c + c(c+1)/2) to Σ i·vᵢ exactly. Full rows never reach an
    * exchange; only distinct (group, value) blocks do. Groups of one
    * value pin gini = 0.
    *
    * Output: one row per group — (groupCol, n_vals, sum_vals, gini_micro);
    * values identical to the retired row-rank form (ProfileSpec pins the
    * hand values, PropertySpec the local rank-identity reference).
    */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val clash = Seq("__gg", "__gv", "__gt", "__gr", "__g0", "__gc", "__gs")
      .filter(Seq(groupCol, valueCol, tieCol).contains)
    require(clash.isEmpty,
      s"giniByGroup reserved column(s) in use: ${clash.mkString(", ")}")
    val dec = DecimalType(38, 0)
    val blocks = df.select(col(groupCol).as("__gg"),
      col(valueCol).cast("long").as("__gv"))
      .groupBy(col("__gg"), col("__gv"))
      .agg(count(lit(1)).as("__gc"))
    // inclusive prefix of block counts in (group, value) order; the group's
    // own start is the min exclusive prefix over its blocks — subtracting
    // it re-bases ranks to 1 within each group, exactly the retired
    // rank-minus-group-min form.
    val pre = Transforms.globalSortPrefixSum(blocks,
      Seq(col("__gg").asc, col("__gv").asc), "__gc", "__gr")
    val base = pre.groupBy(col("__gg"))
      .agg(min(col("__gr") - col("__gc")).as("__g0"))
    def floorDiv(nm: Column, dn: Column): Column =
      ((nm - pmod(nm, dn)) / dn).cast("long")
    // Σ_{i=p+1..p+c} i·v = v·(p·c + c(c+1)/2), with p the block's
    // exclusive within-group prefix. c(c+1)/2 halves the EVEN factor on
    // the long side (shiftright is exact integer halving; c ≥ 1) so every
    // decimal stays scale-0 — a decimal `/ 2` would adopt scale 6 and burn
    // six digits of the (38,0) headroom the rank sum needs at scale.
    val tri = when(pmod(col("__gc"), lit(2)) === 0,
      shiftright(col("__gc"), 1).cast(dec) * (col("__gc") + 1).cast(dec))
      .otherwise(col("__gc").cast(dec) *
        shiftright(col("__gc") + 1, 1).cast(dec))
    pre.join(base, Seq("__gg"))
      .select(col("__gg"), col("__gv"), col("__gc"),
        (col("__gr") - col("__gc") - col("__g0")).as("__gs"))
      .groupBy(col("__gg"))
      .agg(sum(col("__gc")).as("n_vals"),
        coalesce(sum(col("__gc") * col("__gv")), lit(0L)).as("sum_vals"),
        coalesce(sum(col("__gv").cast(dec) *
          (col("__gs").cast(dec) * col("__gc").cast(dec) + tri)),
          lit(0L).cast(dec)).as("__ga"))
      .select(col("__gg").as(groupCol), col("n_vals"), col("sum_vals"),
        when(col("n_vals") === 1 || col("sum_vals") === 0, lit(0L))
          .otherwise(floorDiv(
            (lit(2L).cast(dec) * col("__ga") -
              (col("n_vals").cast(dec) + lit(1L)) *
                col("sum_vals").cast(dec)) * lit(1000000L),
            col("n_vals").cast(dec) * col("sum_vals").cast(dec)))
          .as("gini_micro"))
  }
}
