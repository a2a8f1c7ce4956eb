package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy / compliance operators for training corpora: k-anonymity audit
  * (Sweeney 2002), small-group suppression, l-diversity
  * (Machanavajjhala et al. 2007), and ladder generalization — the
  * releasability checks a dataset pipeline runs before rows with
  * quasi-identifiers (QIs) leave the curation boundary.
  *
  * Scale posture: every operator is one shuffle on the QI tuple (window
  * or groupBy over slim projections — never text, never O(n²)); the
  * generalization ladder adds a |ladder|-row driver argmin (≤ 41 rows),
  * nothing else collects. All arithmetic is integer/count-based, so every
  * output is engine-exact against the DuckDB oracle.
  */
object Privacy {

  private def guard(df: DataFrame, outCols: Seq[String]): Unit = {
    val clash = outCols.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns collide with privacy output columns: $clash")
  }

  /** Annotate each row with its QI-group size and the k-anonymity flag:
    * (input columns) + (qi_group_n, k_anon). A window count rather than a
    * groupBy+join so NULL quasi-identifier values form one group exactly
    * like SQL PARTITION BY (an equi-join would silently drop them).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    guard(df, Seq("qi_group_n", "k_anon"))
    df.withColumn("qi_group_n",
        count(lit(1)).over(Window.partitionBy(quasiCols.map(col): _*)))
      .withColumn("k_anon", col("qi_group_n") >= k)
  }

  /** Keep only rows whose QI group reaches size k (suppression — the
    * blunt release gate). Returns df's own columns.
    */
  def suppressSmallGroups(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    kAnonymity(df, quasiCols, k).filter(col("qi_group_n") >= k)
      .drop("qi_group_n", "k_anon")

  /** Annotate each row with its QI group's count of DISTINCT NON-NULL
    * `sensitiveCol` values (l-diversity; NULL sensitive values don't
    * count, matching SQL COUNT(DISTINCT)): + (l_div, l_ok).
    *
    * Exact two-phase distinct (DISTINCT (QI, sensitive) pairs → count per
    * group) rather than a window dense_rank so the shuffle carries each
    * distinct pair once; the join back is NULL-SAFE on the QI columns.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column '$sensitiveCol' cannot also be a quasi-identifier")
    guard(df, Seq("l_div", "l_ok"))
    val counts = df.select((quasiCols :+ sensitiveCol).map(col): _*)
      .filter(col(sensitiveCol).isNotNull)
      .distinct()
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("l_div"))
      // renamed QI columns break lineage with df (a derived self-join
      // would otherwise hit the ambiguous-attribute analyzer check)
      .select(quasiCols.map(c => col(c).as(s"__qi_$c")) :+ col("l_div"): _*)
    val cond = quasiCols.map(c => df(c) <=> counts(s"__qi_$c")).reduce(_ && _)
    df.join(counts, cond, "left")
      .select(df.columns.map(df(_)) :+
        coalesce(counts("l_div"), lit(0L)).as("l_div"): _*)
      .withColumn("l_ok", col("l_div") >= l)
  }

  /** ε-differentially-private group counts (Dwork et al. 2006) with
    * DETERMINISTIC seeded Laplace noise: exponential magnitude with a
    * random sign IS the Laplace(b) distribution, so
    *
    *   noisy_n = n + sign · ⌊ b · (−ln u) ⌋,   b = sensitivity / ε
    *
    * where u ∈ (0, 1] and the sign come from md5(QIs ⊕ seed) — a keyed
    * PRF, the standard PRG-based DP implementation shape: same seed →
    * same release (reproducible builds), and the seed must stay secret
    * for the guarantee to hold. md5 rather than xxhash64 because the
    * oracle must replay the identical bits in DuckDB (the
    * [[TextOps.simhash32]] precedent). The magnitude is the PortableMath
    * staged log on (r, 2^48), r the first 12 hex digits + 1 — every step
    * integer or correctly-rounded IEEE, so noisy_n is engine-exact. The
    * hash grid truncates the Laplace tail at b·ln(2^48) ≈ 33.3·b
    * (finite-precision DP's usual tail bound).
    *
    * Scale: one groupBy on the QI tuple; noise is a map-only expression
    * over the |groups|-sized result. Output: (groupCols…, n, noisy_n).
    */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String], epsilonMicro: Long,
      seed: String, sensitivity: Long = 1L): DataFrame = {
    require(epsilonMicro > 0, s"epsilonMicro must be positive, got $epsilonMicro")
    require(sensitivity > 0, s"sensitivity must be positive, got $sensitivity")
    require(groupCols.nonEmpty, "need at least one group column")
    guard(df, Seq("n", "noisy_n", "dph", "dpr", "dpd", "dps") ++
      graft.functions.PortableMath.microLnColumns)
    val counts = df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n"))
      .withColumn("dph", md5(concat_ws("",
        groupCols.map(col(_).cast("string")) :+ lit(seed): _*)))
      // 48 uniform bits (+1 → u ∈ (0, 1]); 2^48 < 2^52 keeps the staged
      // log's exact-integer-division precondition
      .withColumn("dpr",
        expr("CAST(conv(substring(dph, 1, 12), 16, 10) AS BIGINT) + 1"))
      .withColumn("dpd", lit(1L << 48))
      .withColumn("dps", expr(
        "CASE WHEN CAST(conv(substring(dph, 13, 1), 16, 10) AS BIGINT) % 2 = 1 " +
          "THEN 1 ELSE -1 END"))
    val chain = graft.functions.PortableMath.microLnStages("dpr", "dpd",
      graft.functions.PortableMath.sparkShiftLeft)
    chain.foldLeft(counts) { case (d, (n, s)) => d.withColumn(n, expr(s)) }
      // lp = ⌊ln(u)·10⁶⌋ ≤ 0; noise in counts = (−lp)·sens DIV εMicro
      .withColumn("noisy_n", col("n") +
        col("dps") * expr(s"((0 - lp) * $sensitivity DIV $epsilonMicro)"))
      .select(groupCols.map(col) ++ Seq(col("n"), col("noisy_n")): _*)
  }

  /** Global power-of-2 generalization ladder (the Mondrian idea reduced
    * to one global recoding): bucket integer `numCol` at the SMALLEST
    * width in {2^0 … 2^maxExp} for which EVERY (quasiCols, bucket) group
    * reaches size k — falling back to the coarsest width if none does.
    * Buckets are floor-aligned via the positive modulus
    * (v − ((v % w + w) % w), negative-safe, identical in Spark and
    * DuckDB). Output: input columns + (qi_bucket, gen_width).
    *
    * One pass evaluates the whole ladder: the slim (QIs, value)
    * projection explodes over the widths (≤ 41× slim-row amplification,
    * documented), aggregates per (width, QIs, bucket), and a
    * |ladder|-row collect picks the width. NULL values bucket to NULL
    * (their own group), matching SQL.
    */
  def generalizeToK(df: DataFrame, quasiCols: Seq[String], numCol: String,
      k: Long, maxExp: Int = 24): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    guard(df, Seq("qi_bucket", "gen_width"))
    val chosen = genWidthFromHist(
      genLadderHist(df, quasiCols, numCol, maxExp), quasiCols, k, maxExp)
    df.withColumn("qi_bucket",
        bucket(col(numCol).cast("long"), lit(chosen)))
      .withColumn("gen_width", lit(chosen))
  }

  private def bucket(v: Column, w: Column): Column = v - pmod(v, w)

  /** The generalization ladder's MERGEABLE state: per-(width, QIs, bucket)
    * row counts over every width in the ladder, as
    * (__w, quasiCols…, __b, __n). Counts over disjoint row batches SUM to
    * the union's histogram, so a streaming loop
    * ([[graft.streaming.Pipelines.genLadderIngest]]) keeps
    * |widths| · |QI buckets| rows and re-picks the release width on
    * demand with [[genWidthFromHist]] — never re-reading a row.
    */
  def genLadderHist(df: DataFrame, quasiCols: Seq[String], numCol: String,
      maxExp: Int = 24): DataFrame = {
    require(maxExp >= 0 && maxExp <= 40, s"maxExp must be in [0, 40], got $maxExp")
    val widths = (0 to maxExp).map(1L << _)
    df.select((quasiCols.map(col) :+ col(numCol).cast("long").as("__v")): _*)
      .withColumn("__w", explode(lit(widths.toArray)))
      .withColumn("__b", bucket(col("__v"), col("__w")))
      .groupBy((col("__w") +: quasiCols.map(col)) :+ col("__b"): _*)
      .agg(count(lit(1)).as("__n"))
  }

  /** Pick the smallest ladder width whose every (QIs, bucket) group
    * reaches k, from a (possibly multi-batch) [[genLadderHist]] table —
    * duplicate hist cells re-sum, so an un-merged batch union is fine.
    * Falls back to the coarsest width, like [[generalizeToK]].
    */
  def genWidthFromHist(hist: DataFrame, quasiCols: Seq[String], k: Long,
      maxExp: Int = 24): Long = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxExp >= 0 && maxExp <= 40, s"maxExp must be in [0, 40], got $maxExp")
    val widths = (0 to maxExp).map(1L << _)
    val perWidth = hist
      .groupBy((col("__w") +: quasiCols.map(col)) :+ col("__b"): _*)
      .agg(sum(col("__n")).as("__n"))
      .groupBy(col("__w"))
      .agg(min(col("__n")).as("__mn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    perWidth.filter(_._2 >= k).map(_._1)
      .sorted.headOption.getOrElse(widths.last)
  }
}
