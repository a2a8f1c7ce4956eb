package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Prints key physical-plan properties for every query at a given SF —
  * the "is this the plan you'd want at 100 TB" audit: filter/projection
  * pushdown reaching the scan, broadcast vs shuffle joins, codegen spans,
  * top-K without global sort.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val full = args.length > 1 && args(1) == "full"
    val spark = GraftSession.local(8, "plan-audit")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (full) {
          println(s"==== $name ====\n$plan")
        } else {
          val props = Seq(
            "pushedFilters" -> plan.contains("PushedFilters: ["),
            "realPushedFilter" -> ("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined),
            "broadcastJoin" -> plan.contains("BroadcastHashJoin"),
            "sortMergeJoin" -> plan.contains("SortMergeJoin"),
            "nestedLoop" -> plan.contains("NestedLoop"),
            "takeOrdered" -> plan.contains("TakeOrdered"),
            "partialAgg" -> plan.contains("partial_"),
            "codegen" -> plan.contains("*("),
            "exchanges" -> ("Exchange".r.findAllIn(plan).size > 0))
          val n = "(?m)^[\\s:+\\-*()0-9]*Exchange ".r.findAllIn(plan).size
          println(f"$name%-26s " +
            props.collect { case (k, true) => k }.mkString(" ") + s" exchanges=$n")
        }
      } catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
