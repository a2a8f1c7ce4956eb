package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds.
  *
  * Two full passes over the query pack: the first pays one-time costs (JVM
  * JIT, codegen compilation, parquet footer caches), the second measures
  * steady-state. The headline `value` is the WARM total — the number that is
  * reproducible across harnesses (an sbt-launched run and a driver-launched
  * run agree once warm); `cold_total_sec` reports the first pass so the
  * one-time overhead stays visible rather than polluting per-query numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a failed query must be visibly failed (-1), never a fast-looking timing
    def runAll(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val secs =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      name -> secs
    }

    val cold = runAll()
    spark.sharedState.cacheManager.clearCache() // warm pass re-reads inputs
    val warm = runAll()
    // a query that failed in either pass is failed, full stop
    val merged = warm.map { case (k, v) => k -> (if (cold(k) < 0) -1.0 else v) }
    val qs = merged.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = merged.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total_sec":$coldTotal,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
