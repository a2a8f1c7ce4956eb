package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-ranked corpus selection: keep the best documents of each group,
  * by count fraction or by token budget — the "filter to the top quartile"
  * and "take the best N-billion-token subset per language" pretraining ops.
  *
  * Both selections are defined by an exact global rank (score desc, id asc
  * — deterministic, engine-reproducible; the DuckDB oracles compute the
  * identical set with a plain window), but neither pays a full per-group
  * sort. Scores must be non-null and lie in [0, 1] (quality scores do; a
  * NULL score fails loudly — its rank would differ between engines). Each
  * group gets a 256-cell histogram over floor(score·255) — one partial
  * agg, |groups|×256 rows collected, bounded like
  * [[Mixture.resampleToMixture]]'s — and the walk from the top cell
  * locates the boundary cell. Cells above it are kept outright; ONLY the
  * boundary cell (~1/256 of the group, unless score mass degenerates onto
  * one value) pays a window. Bucketing is a monotone coarsening of the
  * score order, so the pruned selection equals the plain-rank selection
  * exactly.
  *
  * Corpus-scan economics (100 TB stance): the corpus is scanned ONCE into
  * a slim locally-checkpointed (group, score[, tokens], id) projection —
  * the score expression (for quality scores, a nontrivial regex chain)
  * evaluates exactly once per row — and the histogram plus both kept-set
  * branches read the checkpoint. The caller's output is one LEFT SEMI join
  * of the source against the kept ids, so the final plan contains a single
  * FileScan of the source (PlanSpec-asserted): two source scans total,
  * down from three in the naive union-of-branches shape. The semi join's
  * build side carries only ids; AQE broadcasts it when the kept set is
  * small.
  *
  * Group columns may be any type (grouped on their string form
  * internally); NULL is a legitimate group of its own. `idCol` must
  * uniquely identify rows — the kept set is joined back by id (duplicate
  * ids already made the rank tie-break nondeterministic).
  */
object Selection extends Serializable {

  private val B = 256
  // internal working columns (never visible in the output)
  private val G = "__selg"
  private val Reserved =
    Seq(G, "__selb", "__selbb", "__selneed", "__selsc", "__seltk")

  private def guardReserved(df: DataFrame): Unit = {
    val hit = Reserved.filter(df.columns.contains)
    require(hit.isEmpty,
      s"input must not contain reserved column(s) ${hit.mkString(", ")}")
  }

  private def scoreBucket(score: Column): Column =
    // explicit null propagation: Spark's greatest/least SKIP nulls, so a
    // NULL score would otherwise silently bucket to 0 instead of tripping
    // the histogram's null guard
    when(score.isNull, lit(null).cast("int"))
      .otherwise(floor(least(greatest(score, lit(0.0)), lit(1.0)) * (B - 1))
        .cast("int"))

  /** Per-(group, score-cell) totals of `measure`, collected driver-side.
    * Bounded: |groups|×256 rows of (group, cell, total). Input must carry
    * the stringified group in [[G]].
    */
  private def histogram(df: DataFrame, score: Column,
      measure: Column): Array[(String, Int, Long)] =
    graft.tools.BoundedCollect(
      df.groupBy(col(G).as("g"), scoreBucket(score).as("b"))
        .agg(sum(measure).as("m")),
      1000000L, "Selection histogram: |groups| x 256 cells — selection " +
        "groups are a curated mixture axis (dozens), not a free-text key")
      .map { r =>
        if (r.isNullAt(1)) throw new IllegalArgumentException(
          "Selection: the score column contains NULLs — scores must be " +
            "non-null values in [0, 1] (a NULL's rank is engine-dependent)")
        (r.getString(0), r.getInt(1), r.getLong(2))
      }

  /** Walk each group's cells from the best score down until `target(g)` of
    * the measure is covered; returns (group, boundaryCell, residual measure
    * still needed from the boundary cell). A group whose target covers it
    * entirely gets boundary -1 (keep-everything sentinel: every real cell
    * compares greater).
    */
  private def bounds(hist: Array[(String, Int, Long)],
      target: Map[String, Long]): Seq[(String, Int, Long)] =
    hist.groupBy(_._1).toSeq.map { case (g, cells) =>
      val want = target(g)
      val desc = cells.sortBy(-_._2)
      var cum = 0L
      var i = 0
      while (i < desc.length && cum + desc(i)._3 < want) {
        cum += desc(i)._3; i += 1
      }
      if (i < desc.length) (g, desc(i)._2, want - cum) else (g, -1, 0L)
    }

  /** Null-safe-joins the per-group bounds back in (NULL is a real group). */
  private def withBounds(df: DataFrame, score: Column,
      bs: Seq[(String, Int, Long)]): DataFrame = {
    val boundsDf = broadcast(df.sparkSession.createDataFrame(bs)
      .toDF("__selgb", "__selbb", "__selneed"))
    df.withColumn("__selb", scoreBucket(score))
      .join(boundsDf, col(G) <=> col("__selgb"))
      .drop("__selgb")
  }

  /** Slim single-scan projection: (G, __selsc[, __seltk], idCol), locally
    * checkpointed so the histogram action and the kept-id branches don't
    * re-scan (or re-score) the corpus.
    */
  private def slimCheckpoint(df: DataFrame, groupCol: String, score: Column,
      idCol: String, token: Option[Column]): DataFrame = {
    val base = df.withColumn(G, col(groupCol).cast("string"))
      .withColumn("__selsc", score)
    val withTk = token.fold(base)(t => base.withColumn("__seltk", t))
    withTk.select((Seq(G, "__selsc") ++ token.map(_ => "__seltk") :+ idCol)
      .map(col): _*)
      .localCheckpoint()
  }

  /** Keep the top keepNum/keepDen fraction of each group by (score desc,
    * id asc) — exact integer target floor(n·keepNum/keepDen) per group, so
    * the kept set is reproducible on any engine or cluster layout.
    */
  def topFractionByScore(df: DataFrame, groupCol: String, score: Column,
      idCol: String, keepNum: Long, keepDen: Long): DataFrame = {
    require(keepNum >= 0 && keepDen > 0 && keepNum <= keepDen,
      s"keep fraction must be in [0,1], got $keepNum/$keepDen")
    guardReserved(df)
    val p = slimCheckpoint(df, groupCol, score, idCol, None)
    val hist = histogram(p, col("__selsc"), lit(1L))
    val totals = hist.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val target = totals.map { case (g, n) => g -> n * keepNum / keepDen }
    val j = withBounds(p, col("__selsc"), bounds(hist, target))
    val w = Window.partitionBy(col(G))
      .orderBy(col("__selsc").desc, col(idCol).asc)
    val boundaryIds = j.filter(col("__selb") === col("__selbb"))
      .withColumn("__selrn", row_number().over(w))
      .filter(col("__selrn") <= col("__selneed"))
      .select(col(idCol))
    val keptIds = j.filter(col("__selb") > col("__selbb")).select(col(idCol))
      .unionByName(boundaryIds)
    df.join(keptIds, Seq(idCol), "left_semi")
  }

  /** Per-group cap: keep the top `n` rows of each group by (score desc,
    * id asc) and attach their 1-based `rank` — the source/domain balancing
    * step ("at most N docs per domain") every web-corpus recipe applies
    * before mixing.
    *
    * Unlike the fraction/budget selectors above, the cap is a constant, so
    * no histogram pass is needed: one window per group, and Spark's
    * WindowGroupLimit pushes the `rank <= n` filter below the exchange —
    * each map task keeps at most n rows per group before any shuffle, so
    * the shuffle carries O(groups·n) rows, not the corpus.
    */
  def capPerGroup(df: DataFrame, groupCol: String, score: Column,
      idCol: String, n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    require(!df.columns.contains("rank"),
      "input already has a 'rank' column — rename it before capPerGroup")
    guardReserved(df)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(score.desc, col(idCol).asc)
    df.withColumn("__selb", row_number().over(w))
      .filter(col("__selb") <= n)
      .withColumn("rank", col("__selb").cast("long"))
      .drop("__selb")
  }

  /** Greedy token-budget selection: walk each group in (score desc, id asc)
    * order and keep every document whose running token total stays within
    * `budget` — "the best B tokens per language". The boundary cell's
    * window carries the residual budget left after the cells above it.
    */
  /** MMR (maximal marginal relevance — Carbonell & Goldstein 1998) diverse
    * subset selection: greedily pick `k` items, each maximizing
    * `relevance − max similarity to the already-selected set` (the λ = 1/2
    * MMR objective up to a monotone factor) — the standard way to curate
    * an eval suite or prompt set that is both on-topic and non-redundant.
    *
    * Determinism: `relevance` must be an integer (micro-scaled) column;
    * similarity is the cosine of int8-quantized vectors in micro units —
    * `floor((dot/√(na·nb))·10⁶)` where dot/na/nb are exact BIGINTs, so
    * the floor of an exactly-rounded IEEE double on exact inputs is
    * engine-identical and the DuckDB oracle replays the whole greedy
    * trajectory. Ties break to the smaller id.
    *
    * Scale shape: greedy MMR is inherently sequential, but it does NOT
    * need one Spark job per pick. Each distributed pass collects the
    * top-`bufferM` candidates by CURRENT score (slim rows: id, rel,
    * quantized vector, score) and the driver then serves picks from that
    * buffer locally, for as long as a provable bound holds: once the
    * selected set is non-empty, every candidate's score
    * `rel − max-sim(selected)` is NON-INCREASING as the set grows, so a
    * non-collected candidate can never beat the refill pass's m-th row
    * `(s_m, id_m)` — the locally-updated buffer best is the exact global
    * argmax whenever `score > s_m`, or `score == s_m` with `id ≤ id_m`
    * (refill ties at s_m all carry ids > id_m). When the bound fails, one
    * fresh distributed pass refills the buffer (and its own top row always
    * passes, so every pass makes progress). Round 1 stays a separate
    * pure-relevance pass: `rel − max-sim` is NOT bounded by `rel` when
    * similarities go negative, so the monotone argument only starts once
    * something is selected. Each pass is map-only over the candidates vs
    * a ≤ k broadcast, collecting ≤ bufferM slim rows — typical job count
    * is 2 (pick-1 pass + one refill serving picks 2..k) instead of k.
    *
    * Output: (idCol, sel_rank 1..k, mmr_score_micro at selection time).
    */
  def mmrSelect(df: DataFrame, idCol: String, relevance: Column,
      vecCol: String, k: Int): DataFrame =
    mmrSelect(df, idCol, relevance, vecCol, k, math.max(4 * k, 64))

  /** [[mmrSelect]] with an explicit buffer size (exposed so tests can
    * force the refill / bound-rejection paths with a tiny `bufferM`;
    * any bufferM ≥ 1 yields the identical greedy trajectory).
    */
  def mmrSelect(df: DataFrame, idCol: String, relevance: Column,
      vecCol: String, k: Int, bufferM: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(bufferM > 0, s"bufferM must be positive, got $bufferM")
    val spark = df.sparkSession
    import spark.implicits._
    val cands = df.select(col(idCol).cast("long").as("__mid"),
        relevance.cast("long").as("__mrel"),
        graft.llm.Similarity.quantizeInt8(col(vecCol).cast("array<double>"))
          .as("__mq"))
      .localCheckpoint()
    // Exact local mirror of the graft_int_cosine_micro kernel: BIGINT
    // dot/norms, one IEEE divide + sqrt + multiply + floor in the same
    // order as the Expression's codegen, so driver-side buffer updates
    // produce bit-identical scores to a distributed pass. Mismatched
    // lengths throw, the kernel's loud-refusal stance.
    def simLocal(a: Array[Int], b: Array[Int]): Long = {
      require(a.length == b.length,
        s"mmrSelect: vector lengths differ (${a.length} vs ${b.length})")
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) {
        val x = a(i).toLong; val y = b(i).toLong
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0L || nb == 0L) -2000000L
      else math.floor(dot.toDouble / math.sqrt((na * nb).toDouble)
        * 1000000.0d).toLong
    }
    var picked = Vector.empty[(Long, Long, Long)]
    var selVecs = Vector.empty[(Long, Seq[Int])]
    // Round 1: pure-relevance argmax, its own pass (see scaladoc).
    cands.orderBy(col("__mrel").desc, col("__mid").asc).limit(1)
      .select(col("__mid"), col("__mrel"), col("__mq"))
      .as[(Long, Long, Seq[Int])].collect().headOption.foreach {
        case (id, rel0, q) =>
          picked :+= ((id, 1L, rel0)); selVecs :+= ((id, q))
      }
    // Buffer of (id, rel, qvec, current score); `bound` is the refill's
    // m-th (score, id) — None when the refill returned < bufferM rows,
    // i.e. the buffer holds EVERY remaining candidate.
    final case class Ent(id: Long, rel: Long, q: Array[Int],
        var score: Long)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Ent]
    var bound: Option[(Long, Long)] = None
    var bufHoldsAll = false
    def refill(): Unit = {
      val sel = broadcast(selVecs.toDF("__msid", "__msq"))
      val rows = cands.filter(!col("__mid").isin(picked.map(_._1): _*))
        .crossJoin(sel)
        .withColumn("__msim", graft.llm.Similarity
          .intCosineMicro(col("__mq"), col("__msq")))
        .groupBy(col("__mid"), col("__mrel"), col("__mq"))
        .agg(max(col("__msim")).as("__mmax"))
        .select(col("__mid"), col("__mrel"), col("__mq"),
          (col("__mrel") - col("__mmax")).as("__msc"))
        .orderBy(col("__msc").desc, col("__mid").asc).limit(bufferM)
        .as[(Long, Long, Seq[Int], Long)].collect()
      buf.clear()
      rows.foreach { case (id, rel, q, sc) => buf += Ent(id, rel, q.toArray, sc) }
      bufHoldsAll = rows.length < bufferM
      bound = if (bufHoldsAll) None
              else Some((rows.last._4, rows.last._1))
    }
    var r = 2
    var exhausted = picked.isEmpty
    while (r <= k && !exhausted) {
      // local best by (score desc, id asc)
      var bi = -1; var j = 0
      while (j < buf.length) {
        if (bi < 0 || buf(j).score > buf(bi).score ||
            (buf(j).score == buf(bi).score && buf(j).id < buf(bi).id)) bi = j
        j += 1
      }
      val safe = bi >= 0 && (bound match {
        case None => true
        case Some((sm, im)) =>
          buf(bi).score > sm || (buf(bi).score == sm && buf(bi).id <= im)
      })
      if (safe) {
        val e = buf.remove(bi)
        picked :+= ((e.id, r.toLong, e.score))
        selVecs :+= ((e.id, e.q.toSeq))
        buf.foreach { c =>
          c.score = math.min(c.score, c.rel - simLocal(c.q, e.q))
        }
        r += 1
      } else if (bufHoldsAll) {
        exhausted = true // buffer held every remaining candidate: done
      } else {
        refill() // its own top row always passes the bound → progress
        if (buf.isEmpty) exhausted = true
      }
    }
    spark.createDataFrame(picked)
      .toDF(idCol, "sel_rank", "mmr_score_micro")
  }

  def tokenBudgetByScore(df: DataFrame, groupCol: String, score: Column,
      tokenCount: Column, idCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    guardReserved(df)
    val p = slimCheckpoint(df, groupCol, score, idCol, Some(tokenCount))
    val hist = histogram(p, col("__selsc"), col("__seltk"))
    val target = hist.map(_._1).distinct.map(_ -> budget).toMap
    val j = withBounds(p, col("__selsc"), bounds(hist, target))
    val w = Window.partitionBy(col(G))
      .orderBy(col("__selsc").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryIds = j.filter(col("__selb") === col("__selbb"))
      .withColumn("__selcum", sum(col("__seltk")).over(w))
      .filter(col("__selcum") <= col("__selneed"))
      .select(col(idCol))
    val keptIds = j.filter(col("__selb") > col("__selbb")).select(col(idCol))
      .unionByName(boundaryIds)
    df.join(keptIds, Seq(idCol), "left_semi")
  }

  /** Quantile stratification by ANY engine-exact integer score — the CCNet
    * bucket move ([[CorpusStats.perplexityBuckets]]) generalized from LM
    * perplexity to whatever signal the curation loop trusts (NB margins,
    * Gopher counts, entropy): per group, `ntile(k)` over the TOTAL order
    * (score desc, id asc), so membership is deterministic and
    * hash-comparable across engines, unlike float-threshold bucketing.
    * `qtile` 1 is the BEST (highest-score) slice; bucket labels head /
    * middle / tail (head wins the k = 1 degenerate case).
    *
    * Scale: one shuffle on the group key, per-group sort inside the
    * window — never a global sort; groups are the parallelism unit.
    *
    * Output: df's columns plus (qtile, bucket).
    */
  def scoreBuckets(df: DataFrame, idCol: String, score: Column,
      groupCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val clash = Seq("qtile", "bucket", "__sbq_s").filter(df.columns.contains)
    require(clash.isEmpty,
      s"input must not contain reserved column(s) ${clash.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__sbq_s").desc, col(idCol).asc)
    df.withColumn("__sbq_s", score)
      .withColumn("qtile", ntile(k).over(w).cast("long"))
      .withColumn("bucket",
        when(col("qtile") === 1, "head")
          .when(col("qtile") === k, "tail").otherwise("middle"))
      .drop("__sbq_s")
  }

  /** Preference-pair construction (the RLHF/DPO dataset shape): per group,
    * pair the BEST-scored item (chosen) with the WORST-scored (rejected),
    * deterministic ties by min id on both sides; single-item groups emit
    * nothing (no pair exists), and so do all-equal-score groups (best and
    * worst resolve to the same min id — a zero-margin "preference" is not
    * one). `score` must be an integer-exact expression for engine-exact
    * margins.
    *
    * Scale: two rank windows over the same slim (group, id, score)
    * projection — one shuffle on the group key, no joins against the
    * corpus. Output: (groupCol, chosen_id, rejected_id, chosen_score,
    * rejected_score, margin).
    */
  def prefPairs(df: DataFrame, groupCol: String, idCol: String,
      score: Column): DataFrame = {
    val reserved = Seq("__pp_s", "chosen_id", "rejected_id", "chosen_score",
      "rejected_score", "margin")
    val clash = reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input must not contain reserved column(s) ${clash.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val slim = df.select(col(groupCol), col(idCol).cast("long").as("__pp_id"),
      score.cast("long").as("__pp_s"))
    val best = Window.partitionBy(col(groupCol))
      .orderBy(col("__pp_s").desc, col("__pp_id").asc)
    val worst = Window.partitionBy(col(groupCol))
      .orderBy(col("__pp_s").asc, col("__pp_id").asc)
    slim.withColumn("__rb", row_number().over(best))
      .withColumn("__rw", row_number().over(worst))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        max(when(col("__rb") === 1, col("__pp_id"))).as("chosen_id"),
        max(when(col("__rb") === 1, col("__pp_s"))).as("chosen_score"),
        max(when(col("__rw") === 1, col("__pp_id"))).as("rejected_id"),
        max(when(col("__rw") === 1, col("__pp_s"))).as("rejected_score"))
      .filter(col("__n") >= 2 && col("chosen_id") =!= col("rejected_id"))
      .select(col(groupCol), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }

  /** Weighted sampling WITHOUT replacement, k per group — the
    * Efraimidis–Spirakis (2006) one-pass scheme: each row draws a uniform
    * `u` and is ranked by `u^(1/w)`; the top k per group are a true
    * weighted sample. Here `u` is md5-derived (RNG-free, the
    * sample_weighted idiom: a row's fate never depends on partitioning or
    * corpus growth) and the rank key is compared in exact integer space:
    * `u^(1/w)` ordering ⇔ `ln(u)/w` ordering ⇔ ascending
    * `priority_micro = (−lp)·10⁶ DIV w` with
    * `lp = floor(ln((h+1)/2⁴⁰)·10⁶)` from
    * [[graft.functions.PortableMath.microLnStages]] — all-positive floor
    * division (Spark `DIV` truncates toward zero, DuckDB `//` floors;
    * they agree only on non-negatives, which is why the NEGATIVE ln is
    * flipped before dividing). Weights must be positive integers
    * (micro-scale fractional weights upstream); non-positive weights are
    * excluded, the standard ES convention.
    *
    * Scale: the ln chain evaluates map-only on a slim (group, id, w)
    * projection; the per-group top-k is one rank window whose
    * `sel_rank ≤ k` filter WindowGroupLimit pushes below the exchange
    * (the [[capPerGroup]] shape — O(groups·k) rows shuffle, not the
    * corpus), and the kept ids join back to the caller's rows.
    *
    * Output: the input row + `priority_micro` + `sel_rank` (1..k). A
    * different `salt` draws an independent sample.
    */
  def weightedSampleK(df: DataFrame, groupCol: String, idCol: String,
      weight: Column, k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    guardReserved(df)
    val working = Set("priority_micro", "sel_rank", "__ws_w", "__ws_a") ++
      graft.functions.PortableMath.microLnColumns
    val clash = df.columns.toSeq.filter(working)
    require(clash.isEmpty,
      s"input must not contain reserved column(s) ${clash.mkString(", ")}")
    val slim = df.select(col(groupCol), col(idCol),
        weight.cast("long").as("__ws_w"))
      .where(col("__ws_w") > 0L)
      .withColumn("__ws_a",
        conv(substring(md5(concat(lit(s"$salt:"),
          col(idCol).cast("string"))), 1, 10), 16, 10).cast("long") + 1L)
    val staged = graft.functions.PortableMath
      .microLnStages("__ws_a", (1L << 40).toString,
        graft.functions.PortableMath.sparkShiftLeft)
      .foldLeft(slim) { case (d, (n, s)) => d.withColumn(n, expr(s)) }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("priority_micro").asc, col(idCol).asc)
    val kept = staged
      .withColumn("priority_micro", expr("((-lp) * 1000000) DIV __ws_w"))
      .withColumn("sel_rank", row_number().over(w).cast("long"))
      .filter(col("sel_rank") <= k)
      .select(col(idCol), col("priority_micro"), col("sel_rank"))
    df.join(kept, Seq(idCol))
  }

  /** Effective-sample-size diagnostic for a weighted-sampling design
    * (Kish 1965): per group, `ess = (Σw)² / Σw²` rows "effectively"
    * contribute when rows are drawn proportionally to integer weight
    * `w` — reported as the normalized fraction
    * `ess_micro = floor(10⁶ · (Σw)² / (n · Σw²))` (10⁶ = perfectly even
    * weights, → 0 = one row dominates). The degeneracy gate to run
    * BEFORE [[weightedSampleK]] / a temperature mixture commits to a
    * weighting. All-zero-weight groups pin 0 (nothing would be drawn);
    * negative weights refuse loudly (not a sampling design). Exact
    * DECIMAL(38,0) rational with the explicit-pmod floor; one
    * partial-agg'd shuffle of (group, w, w²).
    */
  def essReport(df: DataFrame, weightCol: Column,
      groupCols: Seq[String] = Nil): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = weightCol.cast("long")
    val base = df.select(groupCols.map(col) :+ w.as("__ess_w"): _*)
    val neg = base.filter(col("__ess_w") < 0).limit(1).count()
    require(neg == 0,
      "essReport: negative weights — not a sampling design; clamp or " +
        "shift upstream")
    val grouped =
      if (groupCols.isEmpty) base.groupBy()
      else base.groupBy(groupCols.map(col): _*)
    grouped
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("__ess_w").cast(dec)), lit(0L).cast(dec))
          .as("__sw"),
        coalesce(sum(col("__ess_w").cast(dec) * col("__ess_w").cast(dec)),
          lit(0L).cast(dec)).as("__sw2"))
      .select(groupCols.map(col) :+ col("n") :+
        when(col("__sw2") === 0, lit(0L)).otherwise {
          val nm = lit(1000000L).cast(dec) * col("__sw") * col("__sw")
          val dn = col("n").cast(dec) * col("__sw2")
          ((nm - pmod(nm, dn)) / dn).cast("long")
        }.as("ess_micro"): _*)
  }
}
