package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference strength fitting — the batch side of RLHF data
  * curation. [[Selection.prefPairs]] builds (chosen, rejected) pairs; this
  * object turns a STREAM of such outcomes into per-item strengths via the
  * Bradley–Terry model (Bradley & Terry 1952) fitted with the MM algorithm
  * (Hunter 2004, "MM algorithms for generalized Bradley–Terry models") —
  * the batch, order-independent analog of Elo: the arena-style rating every
  * preference-data pipeline wants for "which response source actually
  * wins".
  *
  * Everything is fixed-point integer arithmetic (micro units, floor
  * division), the same portability stance as [[Graph.pageRankCentrality]]:
  * strengths are bit-identical on any engine and the DuckDB oracle replays
  * the identical unrolled iterations. Regularization is the standard dummy
  * player (one virtual comparison per item against a fixed anchor of
  * strength 1.0), which pins the scale, guarantees the MLE exists even for
  * items with zero wins or zero losses, and makes the update total.
  */
object Ranking extends Serializable {

  /** One micro unit = 1e-6; initial and anchor strength = 1.0. */
  private val Unit6 = 1000000L
  /** Numerator scale: strength quotients carry 1e12 so two floor divisions
    * still leave 6 significant micro digits. */
  private val Scale12 = 1000000000000L
  /** Per-iteration clamp keeping every quotient in BIGINT: with strengths
    * in [FloorP, CeilP] the pair term `n·1e12 DIV (p_i + p_j)` is at most
    * `n·5e8` and the anchor term stays nonzero, so no intermediate exceeds
    * 2^63 while per-item comparison counts stay under ~9e6 (enforced). */
  private val FloorP = 1000L
  private val CeilP = 1000000000L

  /** Fixed-iteration integer Bradley–Terry strengths from raw comparison
    * outcomes.
    *
    * Input: one row per comparison, `winnerCol` / `loserCol` holding the
    * two item ids (any string-castable type); self-comparisons are dropped.
    * Output: `(id, strength_micro, n_wins, n_comparisons)` for every item
    * that appears in at least one non-self comparison — strengths in micro
    * units (1e6 = the anchor's 1.0), deterministic on any partitioning.
    *
    * Update per iteration (floor division everywhere):
    * {{{
    *   S_i  = Σ_pairs(i,j)  n_ij · 1e12 DIV (p_i + p_j)      // MM denominator
    *   A_i  = 1e12 DIV (p_i + 1e6)                           // dummy player
    *   p_i' = clamp((W_i + 1) · 1e12 DIV (S_i + A_i), 1e3, 1e9)
    * }}}
    * which is Hunter's MM step `p_i' = W_i / Σ_j n_ij/(p_i+p_j)` with one
    * virtual win and one virtual comparison against a strength-1.0 anchor.
    * The clamp bounds are 1e-3..1e3 in real units — far outside any range
    * a regularized fit reaches, present purely as the overflow guarantee.
    *
    * Scale mechanics: comparisons collapse FIRST to one row per unordered
    * item pair (`n`, wins-by-lo) — the iteration cost is the PAIR table,
    * not the raw comparison log. Each round is two hash joins of that slim
    * pair table against the |items|-sized strength table, a map-side
    * Expand emitting both endpoints, and one aggregation — the same
    * iterative-join shape as [[Graph.pageRankCentrality]], O(iterations)
    * shuffles of id-sized rows. Per-round localCheckpoint keeps lineage
    * flat. Overflow bound enforced: (max per-item wins + 1)·1e12 must stay
    * in BIGINT, i.e. ≤ ~9.2e6 wins per item; arena logs above that should
    * be pre-aggregated per (pair, day) or subsampled — the FIT only needs
    * pair counts, which this operator derives anyway.
    */
  def btStrengths(comparisons: DataFrame, winnerCol: String,
      loserCol: String, iterations: Int = 5,
      maxWinsPerItem: Long = 9000000L): DataFrame =
    btStrengthsFromPairCounts(btPairCounts(comparisons, winnerCol, loserCol),
      iterations, maxWinsPerItem)

  /** The comparison log collapsed to one row per unordered pair:
    * `(lo, hi, n, wlo)` with `n` total comparisons and `wlo` wins by the
    * lesser id — the only pass over the raw log, and ADDITIVE state:
    * pair counts of two log halves sum row-wise to the union's, which is
    * what [[graft.streaming.Pipelines.btIngest]] exploits (per-batch
    * deltas, sum-on-read, refit from the merged counts). */
  def btPairCounts(comparisons: DataFrame, winnerCol: String,
      loserCol: String): DataFrame = {
    val cmp = comparisons.select(
        col(winnerCol).cast("string").as("w"),
        col(loserCol).cast("string").as("l"))
      .where(col("w") =!= col("l") && col("w").isNotNull && col("l").isNotNull)
    cmp
      .groupBy(least(col("w"), col("l")).as("lo"),
        greatest(col("w"), col("l")).as("hi"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("w") < col("l"), 1L).otherwise(0L)).as("wlo"))
  }

  /** The MM fit over an existing `(lo, hi, n, wlo)` pair table. */
  def btStrengthsFromPairCounts(pairCounts: DataFrame, iterations: Int = 5,
      maxWinsPerItem: Long = 9000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val pairAgg = pairCounts.localCheckpoint()
    // per-item wins / total comparisons, derived from the pair table (not
    // the log) so the whole fit is pair-sized from here on
    val stats = pairAgg.select(col("lo").as("id"), col("wlo").as("wn"),
        col("n"))
      .unionByName(pairAgg.select(col("hi").as("id"),
        (col("n") - col("wlo")).as("wn"), col("n")))
      .groupBy("id")
      .agg(sum(col("wn")).as("wins"), sum(col("n")).as("ncmp"))
      .localCheckpoint()
    val maxWins = stats.agg(max(col("wins"))).head().getLong(0)
    require(maxWins <= maxWinsPerItem,
      s"btStrengths: an item has $maxWins wins, above the integer-micro " +
        s"numerator bound ($maxWinsPerItem). Pre-aggregate or subsample " +
        "the comparison log — the fit only consumes pair counts.")
    var p = stats.select(col("id"), lit(Unit6).as("p"))
    var i = 0
    while (i < iterations) {
      // pair terms, both endpoints in one map-side Expand (no double join)
      val terms = pairAgg
        .join(p.select(col("id").as("lo"), col("p").as("plo")), "lo")
        .join(p.select(col("id").as("hi"), col("p").as("phi")), "hi")
        .select(explode(array(col("lo"), col("hi"))).as("id"),
          expr(s"(n * $Scale12) DIV (plo + phi)").as("t"))
        .groupBy("id").agg(sum(col("t")).as("s"))
      p = stats.select(col("id"), col("wins"))
        .join(p, "id")
        .join(terms, Seq("id"), "left")
        .select(col("id"),
          least(greatest(
            expr(s"((wins + 1) * $Scale12) DIV " +
              s"(coalesce(s, CAST(0 AS BIGINT)) + $Scale12 DIV (p + $Unit6))"),
            lit(FloorP)), lit(CeilP)).as("p"))
        .localCheckpoint()
      i += 1
    }
    p.join(stats, "id")
      .select(col("id"), col("p").cast("long").as("strength_micro"),
        col("wins").cast("long").as("n_wins"),
        col("ncmp").cast("long").as("n_comparisons"))
  }
}
