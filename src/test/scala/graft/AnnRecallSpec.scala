package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Aggregate recall@k of every ANN variant against the brute-force truth on
  * the synthetic embeddings table — pins the accuracy/cost tradeoff so
  * parameter changes (hashes, tables, cells, probes, codebooks) cannot
  * silently degrade retrieval quality. Planted-dup tests catch gross
  * breakage; this catches drift.
  *
  * Context for the floors: these embeddings are UNIFORM RANDOM — the
  * worst case for ANN, since the top-10 "neighbors" are barely closer
  * than arbitrary points and share no cluster structure for buckets/cells
  * /codes to exploit. Measured on this corpus after the r11 engine-exact
  * integer rewrite (md5-integer hyperplanes, integer-cosine k-means,
  * int8-quantized ranking): LSH ≈ 0.66 with query-side multi-probe,
  * IVF ≈ 0.90 with √n auto-sized cells (22 cells / 5 probes at n=500) and
  * PQ ≈ 0.85 — all UP from the float path (0.55 / 0.59 / 0.83), so the
  * oracle-exactness cost nothing in retrieval quality. Training and
  * probing are deterministic, so these numbers are exact, not averages.
  * Real embedding corpora are clustered and recalls are far higher (the
  * planted-dup tests show 1.0 on structured neighbors). The assertions
  * are drift alarms pinned just under the measured values, not quality
  * targets.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf0001).embeddings
    .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
  private lazy val queries = emb.filter($"vec_id" < 10)

  private def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.filter($"rank" <= 10).select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val truth = topSet(Similarity.bruteForceTopK(queries, emb, k = 10))

  private def recall(got: Set[(Long, Long)]): Double =
    (truth & got).size.toDouble / truth.size

  test("LSH ANN recall@10 vs brute force stays above floor") {
    val r = recall(topSet(Similarity.annTopK(queries, emb, k = 10)))
    info(f"annTopK recall@10 = $r%.3f")
    assert(r >= 0.6, f"LSH recall degraded: $r%.3f (measured 0.66)")
  }

  test("IVF ANN recall@10 vs brute force stays above floor") {
    val r = recall(topSet(Similarity.ivfTopK(queries, emb, k = 10)))
    info(f"ivfTopK recall@10 = $r%.3f")
    assert(r >= 0.85, f"IVF recall degraded: $r%.3f (measured 0.90)")
  }

  test("PQ ANN recall@10 vs brute force stays above floor") {
    val r = recall(topSet(Similarity.pqTopK(queries, emb, k = 10)))
    info(f"pqTopK recall@10 = $r%.3f")
    assert(r >= 0.8, f"PQ recall degraded: $r%.3f (measured 0.85)")
  }

  test("cosineNearDups planted-dup recall is 1.0 at sim exactly 1.0") {
    // a scaled copy quantizes identically (amax-relative int8), so it
    // collides with its source in ALL hash tables and the exact quantized
    // cosine is dot/sqrt(na·nb) = na/sqrt(na²) = 1.0 — recall on planted
    // duplicates is structural, not probabilistic
    val dup = emb.select(($"vec_id" + 100000).as("vec_id"),
      transform($"embedding", x => x * lit(1.1)).as("embedding"))
    val pairs = Similarity.cosineNearDups(emb.unionByName(dup),
        threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 100000 }
    assert(planted.length == 500, s"planted recall ${planted.length}/500")
    assert(planted.forall(_._3 == 1.0),
      "a planted scaled copy scored below exact 1.0")
  }

  test("hybrid ANN fusion agrees with the exact-dense hybrid above floor") {
    // ret_hybrid_rrf's dense leg scores the FULL corpus with the exact
    // quantized cosine, so its fused output is the brute-force reference
    // for ret_hybrid_ann (same BM25 leg, IVF dense leg). Agreement dips
    // only as far as IVF recall does — pin the end-to-end floor.
    def fused(name: String): Set[(String, Long)] =
      graft.queries.CurationOps.queries(name)(spark, sf0001)
        .select($"query_id", $"doc_id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val exact = fused("ret_hybrid_rrf")
    val ann = fused("ret_hybrid_ann")
    assert(exact.nonEmpty)
    val agree = (exact & ann).size.toDouble / exact.size
    info(f"hybrid ANN agreement@k = $agree%.3f")
    assert(agree >= 0.5, f"hybrid ANN fusion diverged: $agree%.3f")
  }
}
