package graft

import graft.tools.BoundedCollect

/** The collect-bound contract (r15 VERDICT ask #8): the library's
  * driver-side collects are each bounded by construction, and
  * [[BoundedCollect]] turns those prose bounds into runtime raises. The
  * migrated sites (survivorAssignment's gated edge lists,
  * topBoilerplateSpans' cutoff-tie candidates, the Selection/Mixture
  * group histograms and allocations, pqTopK's bounded-queries LUTs —
  * since r17 also the unigram/WordPiece vocabulary tables, the NB
  * model's sentinel reads, the ANN training-sample collect and the
  * vocabTopKSketch certification cutoffs) are exercised by their own
  * suites; this spec pins the helper's contract and counts the
  * registry so silent un-migration is visible.
  */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("registry: the migrated-site count only grows (grep-counted " +
      "BoundedCollect call sites in src/main)") {
    // not a substitute for the per-site suites — a tripwire against a
    // refactor quietly reverting a site to a bare collect()
    val srcRoot = java.nio.file.Paths.get("src/main/scala/graft")
    val calls = java.nio.file.Files.walk(srcRoot).iterator()
    var n = 0
    calls.forEachRemaining { p =>
      if (p.toString.endsWith(".scala") &&
          !p.toString.endsWith("BoundedCollect.scala")) {
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        n += "BoundedCollect\\(".r.findAllIn(text).size
      }
    }
    // r16 migrated 8 sites; r17 adds 6 (two tokenizer vocab tables, the
    // NB sentinels, the ANN training sample, two sketch cutoffs), then
    // the r17 optimization pass MERGED survivorAssignment's two
    // per-endpoint-column collects into one two-column call (one edge
    // scan instead of two) — 14 sites became 13 with no contract lost:
    // the merged call still carries the localThreshold bound
    assert(n >= 13, s"BoundedCollect call sites dropped to $n — a " +
      "migrated site reverted to a bare collect()")
  }

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
