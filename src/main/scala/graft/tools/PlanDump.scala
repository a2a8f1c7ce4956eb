package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for the named queries to files:
  * `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <query...>`
  * writes `<outDir>/<query>_<suffix>.txt` per query (r17 plan evidence).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-plandump")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PD wrote $n")
    }
    spark.stop()
  }
}
