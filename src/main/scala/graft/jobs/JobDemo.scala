package graft.jobs

import graft.GraftSession
import graft.etl.{ErrorTolerant, Fixtures}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Runnable end-to-end demo of the control plane: a two-step job (DDL-style
  * command + error-tolerant decode stream) with durable state, then a second
  * run of the same job proving skip-if-complete. Prints the final state doc.
  *
  * Usage: sbt "runMain graft.jobs.JobDemo [stateDir]"
  */
object JobDemo {
  def main(args: Array[String]): Unit = {
    val stateDir = args.headOption.getOrElse(
      sys.props("java.io.tmpdir") + "/graft_job_demo")
    val spark = GraftSession.local(4, "graft-job-demo")
    import spark.implicits._

    val schema = StructType(Seq(
      StructField("name", StringType), StructField("todo", ArrayType(StringType)),
      StructField("id", StringType)))
    val store = new LocalFsStore(stateDir)
    val outDir = stateDir + "/out"

    def runOnce(label: String): Unit = {
      val runner = new JobRunner("demo", "pipeline", store,
        JobRunnerConfig(maxErrors = 10), Some(new JobManager(1000)))
      val prepared = runner.runCmd("prepare") {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      }
      val decoded = ErrorTolerant.json(spark,
        spark.createDataset(Fixtures.malformedJsonStream), schema)
      val streamed = runner.runDecodedStream("decode_and_store", decoded, "json_out",
        good => {
          good.write.mode("overwrite").json(outDir)
          good.count()
        })
      val st = runner.complete()
      println(s"[$label] prepare ran=$prepared, stream ran=$streamed")
      println(s"[$label] state: " + JobState.toJson(st))
    }

    runOnce("run1")
    runOnce("run2 (must skip both steps)")
    spark.stop()
  }
}
