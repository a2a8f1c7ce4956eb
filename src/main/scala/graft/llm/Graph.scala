package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality over pair lists — the dup-graph companion to
  * [[Dedup.survivorAssignment]]: where components answer "which docs are
  * copies of each other", PageRank answers "which member of the family is
  * the canonical one" (the most-linked version of a boilerplate page, the
  * original a mirror farm copied from). PageRank (Page et al. 1999) run on
  * the NEAR-DUP graph, not the web graph: nodes are documents that appear
  * in at least one near-dup pair, edges are the pairs, and the stationary
  * mass concentrates on the members most connected within their family.
  *
  * Everything is fixed-point integer arithmetic (micro units, floor
  * division), so ranks are bit-identical on any engine and the DuckDB
  * oracle replays the identical iterations — the same portability stance as
  * [[Similarity.kmeansInt8]] and the staged-log LM scores.
  */
object Graph extends Serializable {

  /** Fixed-iteration integer PageRank over an undirected pair graph.
    *
    * Semantics: edges are symmetrized and deduplicated, self-pairs dropped.
    * Every node starts at 1,000,000 micro. Each iteration: every node sends
    * `r DIV deg` to each neighbor, then
    * `r' = (1e6 - dampingMicro) + (dampingMicro * Σ incoming) DIV 1e6` —
    * the standard damped update with floor division everywhere, so the
    * result is exact integer math (no float anywhere, unlike the classic
    * double-valued formulation whose sum order would make ranks
    * partitioning-dependent).
    *
    * Scale mechanics: the graph is the PAIRS graph — ∝ duplicates, not
    * corpus size — and each iteration is one hash join of the edge list
    * against the |nodes|-sized rank table plus one aggregation, the
    * canonical iterative-join PageRank shape (O(iterations) shuffles of
    * edge-sized slim rows, never text). Per-round localCheckpoint keeps
    * lineage flat, exactly like [[Dedup.survivorAssignment]]'s star rounds.
    * Overflow bound: a node's incoming sum is < total mass ≈ |nodes|·1e6,
    * and the damping multiply stays in BIGINT while |nodes|·1e6·850000 <
    * 2^63 — i.e. up to ~10^7 dup-graph NODES (not corpus docs). Past that,
    * run per connected component (rank is only consumed within components
    * anyway) or rescale the unit.
    *
    * Returns (id, rank_micro) for every node with at least one non-self
    * edge. Fixed `iterations` (default 5) rather than convergence detection:
    * the consumer ranks WITHIN components, where a handful of damped rounds
    * already orders hubs over leaves, and a fixed count is what keeps the
    * unrolled-CTE oracle finite (the kmeansInt8 trade).
    */
  def pageRankCentrality(pairs: DataFrame, iterations: Int = 5,
      dampingMicro: Long = 850000L, maxNodes: Long = 10000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampingMicro >= 0 && dampingMicro <= 1000000L,
      "dampingMicro must be a micro fraction in [0, 1e6]")
    val e0 = pairs.select(col("id_a").cast("long").as("u"),
        col("id_b").cast("long").as("v"))
      .where(col("u") =!= col("v"))
    // symmetrize ONCE and pin: every iteration re-reads the edge list, and
    // without the checkpoint each round would re-run the whole upstream
    // pair computation (e.g. a full winnow/MinHash pass)
    val edges = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // ENFORCE the documented accumulator bound (was Scaladoc-only through
    // r8): total mass ≈ |nodes|·1e6 and the damping multiply must stay in
    // BIGINT, i.e. |nodes|·1e6·850000 < 2^63 ⇔ |nodes| ≲ 1.08e7. A full
    // web graph mis-fed here must fail loudly, not overflow silently.
    // One count() over the already-checkpointed |nodes| frame — O(nodes),
    // trivial next to the iteration joins.
    val nNodes = deg.count()
    require(nNodes <= maxNodes,
      s"pageRankCentrality: $nNodes nodes exceeds the integer-micro " +
        s"accumulator bound ($maxNodes). This operator ranks DUP-GRAPH " +
        "components, not web graphs — run it per connected component " +
        "(rank is only consumed within components) or rescale the unit.")
    val base = 1000000L - dampingMicro
    // edge ⋈ deg ONCE, outside the loop (r17): deg(u) never changes, so
    // re-joining it every round paid iterations−1 identical shuffles of
    // the edge list; each round now joins only the rank table. Values
    // unchanged — the per-edge `r DIV deg` sees the same (r, deg) pairs.
    val edgesDeg = edges.join(deg, "u").localCheckpoint()
    var rank = deg.select(col("u").as("id"), lit(1000000L).as("r"))
    var i = 0
    while (i < iterations) {
      // round 1 in closed form (r17): every rank is the 1000000 literal,
      // so the rank join resolves to a constant — contrib is directly
      // Σ (1000000 DIV deg) per target, the exact value the join form
      // computed
      val contrib = (if (i == 0)
          edgesDeg.withColumn("r", lit(1000000L))
        else edgesDeg.join(rank.select(col("id").as("u"), col("r")), "u"))
        .groupBy(col("v").as("id"))
        .agg(sum(expr("r DIV deg")).as("s"))
      // symmetric graph: every node receives from each neighbor, so the
      // left join never actually misses — kept for isolated-node safety
      rank = deg.select(col("u").as("id"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"), (lit(base) +
          expr(s"($dampingMicro * coalesce(s, CAST(0 AS BIGINT))) DIV 1000000"))
          .as("r"))
        .localCheckpoint()
      i += 1
    }
    rank.select(col("id"), col("r").cast("long").as("rank_micro"))
  }
}
