package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixture rebalancing: downsample groups (language, domain, source)
  * to a target weight distribution — the pretraining "data mixture" op, in
  * both document-count and token-budget form. Everything is integer
  * arithmetic over a content-hash order, so the selected set is exact,
  * engine-reproducible (the DuckDB oracles compute the identical sets),
  * and independent of cluster layout.
  */
object Mixture extends Serializable {

  /** Keep the largest subset realizing `weights` as exact proportions of
    * DOCUMENT COUNTS, downsampling only. See [[resampleByMeasure]].
    */
  def resampleToMixture(df: DataFrame, groupCol: String,
      weights: Map[String, Long], idCol: String): DataFrame =
    resampleByMeasure(df, groupCol, lit(1L), weights, idCol)

  /** TOKEN-weighted mixture: pretraining mixtures are specified in tokens,
    * not documents — realize `weights` as exact token proportions, keeping
    * each group's hash-prefix documents while its running token total stays
    * within the group's share (greedy prefix, like
    * [[Selection.tokenBudgetByScore]]). `tokenCount` must be a non-null
    * positive Column (e.g. `TextOps.tokenCount(col("text"))`).
    */
  def resampleToTokenMixture(df: DataFrame, groupCol: String,
      tokenCount: Column, weights: Map[String, Long],
      idCol: String): DataFrame =
    resampleByMeasure(df, groupCol, tokenCount, weights, idCol)

  /** The one mixture walk, parameterized by the per-row measure (1 for
    * document counts — a running sum of ones IS the row number — or a
    * token count for token budgets): with W = Σ weights and m_g = group
    * g's measure total, the achievable total is T = min_g floor(m_g·W /
    * w_g) and each group keeps its hash-prefix rows while the running
    * measure stays within floor(T·w_g / W). Groups absent from `weights`
    * are dropped; a weighted group absent from `df` doesn't constrain T.
    *
    * Scale mechanics: selection-by-rank normally costs a full per-group
    * sort — a corpus-sized group makes that a giant single-partition sort.
    * Instead a 256-cell md5-prefix histogram per group (one partial agg,
    * |groups|×256 rows collected — bounded like the IVF centroid collect)
    * locates each group's boundary bucket; rows below it are kept outright
    * and ONLY the boundary bucket (~1/256 of the group) pays a window. The
    * histogram walk and the plain per-group rank produce the same set
    * because the bucket is the hash's own prefix: (bucket, hash, id) order
    * IS (hash, id) order.
    *
    * Corpus-scan economics: the weighted rows are scanned ONCE into a slim
    * locally-checkpointed (group, id, measure) projection — the measure
    * (often a tokenizer pass) evaluates once per row — and the histogram
    * plus both kept-set branches read the checkpoint; the output is one
    * LEFT SEMI join of the source against the kept ids (a single FileScan
    * in the final plan, PlanSpec-asserted). `idCol` must uniquely identify
    * rows — the kept set is joined back by id.
    */
  private def resampleByMeasure(df: DataFrame, groupCol: String,
      measure: Column, weights: Map[String, Long], idCol: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val bigW = weights.values.sum
    val inMix = df.filter(col(groupCol).isInCollection(weights.keys.toSeq))
    prefixSelect(inMix, groupCol, measure, idCol, totals => {
      val total = totals.map { case (g, n) => n * bigW / weights(g) }.min
      totals.map { case (g, _) => g -> total * weights(g) / bigW }
    })
  }

  /** The shared histogram-prefix selection: keep each group's md5-prefix
    * rows while the running measure stays within `targetsOf(group totals)`.
    * See [[resampleByMeasure]] for the 256-cell histogram mechanics — only
    * the boundary bucket pays a window; `targetsOf` runs driver-side on
    * the |groups|-sized totals map.
    */
  private def prefixSelect(inMix: DataFrame, groupCol: String,
      measure: Column, idCol: String,
      targetsOf: Map[String, Long] => Map[String, Long]): DataFrame = {
    // reserved working names — silently overwriting + dropping a caller's
    // column would corrupt the output (same contract as Joins' __bin/__salt)
    val reserved = Seq("__mxb", "__mxbb", "__mxneed", "__mxm", "__mxcum")
      .filter(inMix.columns.contains)
    require(reserved.isEmpty,
      s"input must not contain reserved column(s) ${reserved.mkString(", ")}")
    val hash = md5(col(idCol).cast("string"))
    val bucket = substring(hash, 1, 2)
    // ONE scan of the weighted rows: slim (group, id, measure) checkpoint
    val slim = inMix.withColumn("__mxm", measure)
      .select(col(groupCol), col(idCol), col("__mxm"))
      .localCheckpoint()

    // |groups|×256 rows — bounded, the only driver-side state
    val hist = graft.tools.BoundedCollect(
      slim.groupBy(col(groupCol).as("g"), bucket.as("b"))
        .agg(sum(col("__mxm")).as("n")),
      1000000L, "Mixture histogram: |groups| x 256 cells — mixture " +
        "groups are a curated axis (languages/domains), not free text")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    if (hist.isEmpty) return inMix // no weighted group present

    val totals = hist.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val targets = targetsOf(totals)
    // boundary bucket + residual measure inside it, per group
    val bounds = totals.keys.toSeq.map { g =>
      val target = targets(g)
      val cells = hist.filter(_._1 == g).sortBy(_._2)
      var cum = 0L
      var i = 0
      while (i < cells.length && cum + cells(i)._3 < target) {
        cum += cells(i)._3; i += 1
      }
      if (i < cells.length) (g, cells(i)._2, target - cum) else (g, "zz", 0L)
    }
    val spark = inMix.sparkSession
    val boundsDf = broadcast(
      spark.createDataFrame(bounds).toDF(groupCol, "__mxbb", "__mxneed"))

    val j = slim.withColumn("__mxb", bucket).join(boundsDf, groupCol)
    val lowIds = j.filter(col("__mxb") < col("__mxbb")).select(col(idCol))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hash.asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryIds = j.filter(col("__mxb") === col("__mxbb"))
      .withColumn("__mxcum", sum(col("__mxm")).over(w))
      .filter(col("__mxcum") <= col("__mxneed"))
      .select(col(idCol))
    inMix.join(lowIds.unionByName(boundaryIds), Seq(idCol), "left_semi")
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual Pretraining"):
    * given a total token budget `B` and a per-group repeat cap `maxEpochs`,
    * allocate the budget as uniformly as possible across groups without
    * giving any group more than `maxEpochs` passes over its own tokens —
    * integer waterfilling.
    *
    * With groups sorted ascending by cap `c_g = maxEpochs·n_g` (ties on
    * group name): walk the prefix; group j is capped iff
    * `c_j · M_j ≤ R_j` where `R_j` is the budget left before j and `M_j`
    * the groups left including j (equivalent to `c_j ≤ R_j div M_j` for
    * positive integers, but division-free). The first uncapped group ends
    * the prefix — caps are ascending, so cappedness is prefix-monotone.
    * The remaining M groups split R: each gets `w = R div M`, and the
    * first `R mod M` of them (ascending order) get one extra token, so the
    * allocation exactly exhausts min(B, Σc_g).
    *
    * Everything is exact BIGINT arithmetic — the DuckDB oracle reproduces
    * the identical allocation via window prefix sums. `budgetOf` receives
    * the corpus token total T so budgets can be stated relative to the
    * corpus (e.g. `t => 3 * t / 4`); `epochs_micro = alloc·10⁶ div n_g`
    * needs `alloc < 2^63/10⁶ ≈ 9.2·10¹²` tokens per group — documented,
    * not guarded.
    *
    * Scale shape: ONE corpus scan into a partial-aggregated
    * (group, token-sum); the waterfill itself runs driver-side over
    * |groups| rows (languages/domains — bounded like the histogram and
    * centroid collects elsewhere in this package).
    *
    * Output: (groupCol, n_tokens, cap, alloc, epochs_micro), one row per
    * group, allocation in tokens.
    */
  def unimaxAllocation(df: DataFrame, groupCol: String, tokenCount: Column,
      maxEpochs: Long, budgetOf: Long => Long): DataFrame = {
    val spark = df.sparkSession
    val groups = graft.tools.BoundedCollect(
      df.groupBy(col(groupCol)).agg(sum(tokenCount).as("n")),
      1000000L, "unimaxAllocation: one row per mixture group — a " +
        "curated axis, not a free-text key")
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = waterfill(groups.toIndexedSeq, maxEpochs, budgetOf)
    spark.createDataFrame(rows)
      .toDF(groupCol, "n_tokens", "cap", "alloc", "epochs_micro")
  }

  /** The UniMax integer waterfill over (group, token total) rows — shared
    * by [[unimaxAllocation]] (reporting) and [[unimaxSelect]]
    * (materialization). Returns (group, n, cap, alloc, epochs_micro) in
    * ascending-cap order.
    */
  private def waterfill(groupTotals: Seq[(String, Long)], maxEpochs: Long,
      budgetOf: Long => Long): Seq[(String, Long, Long, Long, Long)] = {
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    require(groupTotals.nonEmpty, "no groups to allocate")
    val groups = groupTotals.sortBy { case (g, n) => (maxEpochs * n, g) }
    val budget = budgetOf(groups.map(_._2).sum)
    require(budget >= 0, s"budget must be non-negative, got $budget")

    // ascending-cap walk: capped prefix, then waterfill the rest
    var remaining = budget
    var left = groups.length.toLong
    var i = 0
    while (i < groups.length &&
        maxEpochs * groups(i)._2 * left <= remaining) {
      remaining -= maxEpochs * groups(i)._2
      left -= 1
      i += 1
    }
    val w = if (left == 0) 0L else remaining / left
    val r = if (left == 0) 0L else remaining % left
    groups.zipWithIndex.map { case ((g, n), j) =>
      val cap = maxEpochs * n
      val alloc =
        if (j < i) cap
        else w + (if (j - i < r) 1L else 0L)
      (g, n, cap, alloc, alloc * 1000000L / n)
    }
  }

  /** Temperature-sampled mixture (XLM-style, Lample & Conneau 2019): group
    * sampling mass ∝ n_g^α with α = 1/2 — the square-root reweighting that
    * lifts low-resource languages without letting the head dominate. Unlike
    * [[unimaxAllocation]]'s hard per-group epoch caps, this is a smooth
    * power-law flattening; α = 1/2 specifically because the integer square
    * root is EXACT (a correctly-rounded IEEE sqrt snapped by two integer
    * comparisons — the same trick both engines compute bit-identically),
    * so the whole allocation is reproducible integer arithmetic with no
    * staged-log machinery. Fractional-α variants would ride the
    * PortableMath exp/ln stages instead; nobody has needed one yet.
    *
    * The allocation: s_g = isqrt(n_g), S = Σ s_g, B = `budgetOf`(Σ n_g);
    * each group gets floor(B·s_g / S) tokens and the first B mod-ish
    * remainder groups (s desc, group asc) get one extra, so the allocation
    * exactly exhausts B. B·s_g is computed in BigInt driver-side (the
    * collect is |groups|-sized, like the waterfill) — at 100 TB, B ≈ 10¹³
    * tokens × s_g ≈ 10⁶·⁵ overflows a 64-bit long, and a silently wrapped
    * allocation would be a corrupt mixture.
    *
    * Output: (groupCol, n_tokens, w_sqrt, samp_micro, alloc) — the sqrt
    * weight, the sampling probability in micro units (floor), and the token
    * allocation. `alloc` may exceed `n_tokens` for tail groups (upsampling
    * is a training-loop concern); [[temperatureSelect]] caps at the
    * group's own tokens when materializing.
    */
  def temperatureAllocation(df: DataFrame, groupCol: String,
      tokenCount: Column, budgetOf: Long => Long): DataFrame = {
    val spark = df.sparkSession
    val groups = graft.tools.BoundedCollect(
      df.groupBy(col(groupCol)).agg(sum(tokenCount).as("n")),
      1000000L, "temperatureAllocation: one row per mixture group — a " +
        "curated axis, not a free-text key")
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = temperatureMix(groups.toIndexedSeq, budgetOf)
    spark.createDataFrame(rows)
      .toDF(groupCol, "n_tokens", "w_sqrt", "samp_micro", "alloc")
  }

  /** Exact floor integer square root for non-negative longs: the
    * correctly-rounded double sqrt is within ±1 of the true floor root;
    * two integer comparisons snap it. Mirrored verbatim by the oracle SQL.
    */
  private def isqrt(n: Long): Long = {
    require(n >= 0, s"isqrt of negative $n")
    val y0 = math.sqrt(n.toDouble).toLong
    if ((y0 + 1) * (y0 + 1) <= n) y0 + 1
    else if (y0 * y0 > n) y0 - 1
    else y0
  }

  /** The α=1/2 temperature allocation over (group, token total) rows —
    * shared by [[temperatureAllocation]] (reporting) and
    * [[temperatureSelect]] (materialization). BigInt only for the B·s_g
    * product; every emitted value fits a long because alloc ≤ B.
    */
  private def temperatureMix(groupTotals: Seq[(String, Long)],
      budgetOf: Long => Long): Seq[(String, Long, Long, Long, Long)] = {
    require(groupTotals.nonEmpty, "no groups to allocate")
    val budget = budgetOf(groupTotals.map(_._2).sum)
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val withS = groupTotals.map { case (g, n) => (g, n, isqrt(n)) }
    val bigS = withS.map(_._3).sum
    require(bigS > 0, "all groups are empty — nothing to weight")
    val floors = withS.map { case (g, n, s) =>
      (g, n, s, (BigInt(budget) * s / bigS).toLong, 1000000L * s / bigS)
    }
    val rem = budget - floors.map(_._4).sum
    // remainder order: biggest sampling mass first, group name breaks ties
    val bonus = floors.sortBy { case (g, _, s, _, _) => (-s, g) }
      .take(rem.toInt).map(_._1).toSet
    floors.map { case (g, n, s, fa, sm) =>
      (g, n, s, sm, fa + (if (bonus(g)) 1L else 0L))
    }
  }

  /** Materialize an α=1/2 temperature mixture: keep each group's
    * md5-prefix documents while its running token total stays within
    * min(n_g, alloc_g) — the same greedy hash-prefix selection every
    * mixture op here uses (downsample-only; a tail group whose allocation
    * exceeds its own tokens keeps every row). One corpus scan: the
    * selection histogram supplies the group totals.
    */
  def temperatureSelect(df: DataFrame, groupCol: String, tokenCount: Column,
      budgetOf: Long => Long, idCol: String): DataFrame =
    prefixSelect(df, groupCol, tokenCount, idCol, totals =>
      temperatureMix(totals.toSeq, budgetOf)
        .map { case (g, n, _, _, alloc) => g -> math.min(n, alloc) }.toMap)

  /** Materialize a UniMax allocation: keep each group's md5-prefix
    * documents while its running token total stays within the group's
    * waterfilled allocation — [[unimaxAllocation]] composed with the same
    * greedy hash-prefix selection every mixture op here uses, so the kept
    * set is exact, engine-reproducible, and layout-independent. One corpus
    * scan: the selection's own 256-cell histogram supplies the group token
    * totals the waterfill needs (no separate aggregation pass). Groups
    * whose allocation exceeds their own tokens (capped groups under
    * `maxEpochs` ≥ 1) keep every row — repetition/epochs are a training-
    * loop concern, not a selection one.
    */
  def unimaxSelect(df: DataFrame, groupCol: String, tokenCount: Column,
      maxEpochs: Long, budgetOf: Long => Long, idCol: String): DataFrame =
    prefixSelect(df, groupCol, tokenCount, idCol, totals =>
      waterfill(totals.toSeq, maxEpochs, budgetOf)
        .map { case (g, _, _, alloc, _) => g -> alloc }.toMap)
}
