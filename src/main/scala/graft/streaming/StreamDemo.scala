package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.types._

/** Runnable streaming demo: live file-drop directory → error-tolerant decode
  * stream → memory sink, proving incremental pickup of new drops and
  * errors-as-data in motion.
  *
  * Usage: sbt "runMain graft.streaming.StreamDemo"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "graft-stream-demo")
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_stream_demo")
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("id", StringType)))

    java.nio.file.Files.write(in.resolve("a.ndjson"),
      "{\"name\":\"x\",\"id\":\"1\"}\nnot json at all".getBytes)
    val q = Streams.decodeJsonStream(spark, in.toString + "/*.ndjson", schema)
      .writeStream.format("memory").queryName("live").outputMode("append").start()
    q.processAllAvailable()
    println(s"[drop1] rows=${spark.table("live").count()} " +
      s"errs=${spark.table("live").filter($"is_error").count()}")

    java.nio.file.Files.write(in.resolve("b.ndjson"),
      "{\"name\":\"y\",\"id\":\"2\"}".getBytes)
    q.processAllAvailable()
    println(s"[drop2] rows=${spark.table("live").count()} " +
      s"files=${spark.table("live").select("source").distinct().count()}")
    q.stop()
    spark.stop()
  }
}
