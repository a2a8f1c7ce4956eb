package graft.tools

import graft.GraftSession
import graft.queries.LlmOps

/** End-to-end timing of the minhash near-dup query at a given SF dir.
  * Optional 2nd/3rd args: numHashes bands (for recall-vs-cost sweeps).
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "minhash-profile")
    // warmup
    graft.SparkEntry.entry(spark).count()
    val t0 = System.nanoTime()
    // always over the planted-dup corpus so the pair count (and the
    // optional recall below) is comparable across parameter sweeps
    val n = (args.lift(1), args.lift(2)) match {
      case (Some(h), Some(b)) =>
        graft.llm.Dedup.minhashNearDups(LlmOps.docsForProfile(spark, dir),
          "doc_id", "text", numHashes = h.toInt, bands = b.toInt).count()
      case _ => LlmOps.queries("dedup_minhash")(spark, dir).count()
    }
    println(f"[mh] dedup_minhash end-to-end: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")

    // measured recall vs ground truth: brute-force exact Jaccard over ALL
    // pairs (O(n²) — profile-tool only, run at small SF)
    if (args.lift(3).contains("recall")) {
      import org.apache.spark.sql.functions._
      val docs = LlmOps.docsForProfile(spark, dir)
      val sets = graft.llm.Dedup.shingleSets(docs, "doc_id", "text", 3)
      val all = sets.select(col("id").as("id_a"), col("set").as("set_a"))
        .crossJoin(sets.select(col("id").as("id_b"), col("set").as("set_b")))
        .filter(col("id_a") < col("id_b"))
      val truth = graft.llm.Dedup.jaccardVerify(
        all.select(col("id_a"), col("id_b")), sets, "id", "set", 0.5)
      val nTruth = truth.count() // the O(n²) ground truth runs exactly once
      println(s"[mh] ground-truth pairs: $nTruth, lsh found: $n " +
        s"(recall = ${n.toDouble / nTruth})")
    }
    spark.stop()
  }
}
