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
    val n = (args.lift(1), args.lift(2)) match {
      case (Some(h), Some(b)) =>
        import org.apache.spark.sql.functions.col
        graft.llm.Dedup.minhashNearDups(
          graft.Tables(spark, dir).documents.select(col("doc_id"), col("text")),
          "doc_id", "text", numHashes = h.toInt, bands = b.toInt).count()
      case _ => LlmOps.queries("dedup_minhash")(spark, dir).count()
    }
    println(f"[mh] dedup_minhash end-to-end: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
    spark.stop()
  }
}
