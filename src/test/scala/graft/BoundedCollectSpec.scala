package graft

import graft.tools.BoundedCollect

/** The collect-bound contract (r15 VERDICT ask #8): the library's
  * driver-side collects are each bounded by construction, and
  * [[BoundedCollect]] turns those prose bounds into runtime raises. The
  * migrated sites (survivorAssignment's gated edge lists,
  * topBoilerplateSpans' cutoff-tie candidates, the Selection/Mixture
  * group histograms and allocations, pqTopK's bounded-queries LUTs) are
  * exercised by their own suites; this spec pins the helper's contract.
  */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("under the bound: every row is returned (the cap never truncates " +
      "a legal result)") {
    val got = BoundedCollect(
      spark.range(100).selectExpr("id").as[Long], 100L, "exactly at bound")
    assert(got.toSet === (0L until 100L).toSet)
    assert(BoundedCollect(spark.range(0).as[Long], 5L, "empty").isEmpty)
  }

  test("red case: one row past the bound raises, names the documented " +
      "invariant, and never collects the unbounded frame") {
    val e = intercept[IllegalArgumentException] {
      BoundedCollect(spark.range(101).as[Long], 100L,
        "test invariant: gated <= 100")
    }
    assert(e.getMessage.contains("test invariant: gated <= 100"))
    assert(e.getMessage.contains("100"))
    // the plan is capped BEFORE collection: a bound violation on an
    // enormous frame must allocate bound+1 rows, not the frame — proven
    // by the cap being a plan-level limit (CollectLimit), not a
    // post-collect length check
    val capped = spark.range(2000000000L).as[Long].limit(101)
    assert(capped.queryExecution.executedPlan.toString
      .contains("CollectLimit") ||
      capped.queryExecution.executedPlan.toString.contains("Limit"))
    val e2 = intercept[IllegalArgumentException] {
      BoundedCollect(spark.range(2000000000L).as[Long], 100L,
        "huge frame, tiny bound")
    }
    assert(e2.getMessage.contains("huge frame, tiny bound"))
  }

  test("nonsensical bounds are rejected loudly") {
    for (bad <- Seq(0L, -1L, Int.MaxValue.toLong)) {
      val e = intercept[IllegalArgumentException] {
        BoundedCollect(spark.range(1).as[Long], bad, "bad bound")
      }
      assert(e.getMessage.contains("nonsensical bound"))
    }
  }
}
