package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-JVM interleaved A/B of the bitext pair stage under the two
  * quantizer forms (r17 debug aid): A = verbatim retired HOF combinator,
  * B = native QuantizeInt8 kernel. Same session, alternating reps, so
  * ambient host drift hits both arms equally.
  */
object QzAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-qzab")
    def hofQuantize(v: Column): Column = {
      val amax = array_max(transform(v, x => abs(x.cast("double"))))
      when(amax === 0.0, transform(v, _ => lit(0)))
        .otherwise(transform(v,
          x => floor(x.cast("double") * 127.0 / amax + 0.5).cast("int")))
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def side(parity: Int, q: Column => Column, out: String) =
      e.filter(pmod(col("vec_id"), lit(2)) === parity)
        .select(col("vec_id").cast("long").as(out), q(col("v")).as(s"__q$out"))
    def pairs(q: Column => Column, ckpt: Boolean): Long = {
      def mat(df: DataFrame) = if (ckpt) df.localCheckpoint() else df
      val s = mat(side(0, q, "src_id"))
      val t = mat(side(1, q, "tgt_id"))
      s.crossJoin(broadcast(t))
        .select(col("src_id"), col("tgt_id"),
          graft.llm.Similarity.intCosineMicro(
            col("__qsrc_id"), col("__qtgt_id")).as("sim"))
        .localCheckpoint().count()
    }
    def time(q: Column => Column, ckpt: Boolean): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      pairs(q, ckpt)
      (System.nanoTime() - t0) / 1e9
    }
    // warmups
    time(hofQuantize, false); time(graft.llm.Similarity.quantizeInt8, false)
    time(graft.llm.Similarity.quantizeInt8, true)
    (1 to 4).foreach { i =>
      val a = time(hofQuantize, false)
      val b = time(graft.llm.Similarity.quantizeInt8, false)
      val c = time(graft.llm.Similarity.quantizeInt8, true)
      val d = time(hofQuantize, true)
      println(f"AB rep$i hof=$a%.3f kernel=$b%.3f kernel+ckpt=$c%.3f hof+ckpt=$d%.3f")
    }
    spark.stop()
  }
}
