package graft.tools

import graft.{GraftSession, SparkEntry}

/** Pinned re-measurement of flagged queries: N reps each (median + spread)
  * plus the FINAL adaptive physical plan (AQE re-plans at runtime, so only
  * the post-execution plan shows what actually ran — e.g. whether a
  * shuffle join was converted to broadcast). Args: sfDir [reps] [query...].
  */
object RegressionProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("q15_cube", "q29_above_own_avg", "sim_ann_ivf", "sim_topk_brute")
    val spark = GraftSession.local(32, "regression-probe")
    // warmup: JVM/codegen/parquet-footer one-time costs out of the way
    SparkEntry.entry(spark).count()

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.length / 2)
      println(f"[probe] $name%-22s median=$med%.2fs min=${times.head}%.2fs max=${times.last}%.2fs reps=$reps")
      // final (post-AQE) plan of the last run
      val df = fn(spark, dir)
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin")
        .map(j => s"$j=${j.r.findAllIn(plan).size}").mkString(" ")
      println(s"[probe]   final-plan joins: $joins exchanges=${"(?m)^[\\s:+\\-*()0-9]*Exchange ".r.findAllIn(plan).size}")
      if (sys.env.get("PROBE_FULL_PLAN").contains("1"))
        println(s"==== $name final plan ====\n$plan")
    }
    spark.stop()
  }
}
