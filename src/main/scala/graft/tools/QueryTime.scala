package graft.tools

import graft.{GraftSession, SparkEntry}

/** Focused per-query timing harness for optimization A/B runs (r17):
  * `runMain graft.tools.QueryTime <sfDir> <reps> <query...>` times ONLY
  * the named queries with the Bench methodology (count() action, cache
  * clear between reps, one unrecorded warmup pass, median of reps) and
  * prints one `name: median=<s> reps=[..]` line per query. Measurement
  * aid only — never part of the driver contract.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-querytime")
    def pass(): Map[String, Double] = {
      spark.sharedState.cacheManager.clearCache()
      names.map { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        n -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    pass(); pass() // warmups (JIT/codegen + footer caches)
    val runs = (1 to reps).map(_ => pass())
    names.foreach { n =>
      val vs = runs.map(_(n)).sorted
      val med =
        if (vs.size % 2 == 1) vs(vs.size / 2)
        else (vs(vs.size / 2 - 1) + vs(vs.size / 2)) / 2
      println(f"QT $n%-24s median=$med%7.3f reps=" +
        vs.map(v => f"$v%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
