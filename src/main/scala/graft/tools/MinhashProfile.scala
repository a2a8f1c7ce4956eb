package graft.tools

import graft.GraftSession
import graft.queries.LlmOps

/** End-to-end timing of the minhash near-dup query at a given SF dir. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "minhash-profile")
    // warmup
    graft.SparkEntry.entry(spark).count()
    val t0 = System.nanoTime()
    val n = LlmOps.queries("dedup_minhash")(spark, dir).count()
    println(f"[mh] dedup_minhash end-to-end: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
    spark.stop()
  }
}
