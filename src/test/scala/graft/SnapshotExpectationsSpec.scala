package graft

import graft.etl.{Expectations, Snapshot}
import graft.etl.Expectations.Expectation
import org.apache.spark.sql.functions._

/** Snapshot diff four-fates semantics + expectation-suite exactness. */
class SnapshotExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("diff reports added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "v", "n")
    val cur = Seq((1L, "a", 10L), (2L, "B", 20L), (4L, "d", 40L))
      .toDF("k", "v", "n")
    val got = Snapshot.diff(old, cur, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("diff digest covers every non-key column, NULL-safely") {
    val old = Seq((1L, Some("x"), 1L)).toDF("k", "v", "n")
    val cur = Seq((1L, None: Option[String], 1L)).toDF("k", "v", "n")
    val got = Snapshot.diff(old, cur, Seq("k")).select("change")
      .as[String].collect()
    assert(got.toSeq === Seq("changed"))
    // identical snapshots diff to nothing
    assert(Snapshot.diff(old, old, Seq("k")).count() === 0L)
  }

  test("diff refuses mismatched schemas and reserved columns") {
    val a = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Snapshot.diff(a, Seq((1L, "x")).toDF("k", "w"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      val withChange = Seq((1L, "x", "y")).toDF("k", "v", "change")
      Snapshot.diff(withChange, withChange, Seq("k"))
    }
  }

  test("row rules: NULL predicates count as violations, one fused scan") {
    val df = Seq(
      (1L, Some(5L), "en"), (2L, None, "en"), (3L, Some(-1L), "xx")
    ).toDF("id", "n", "lang")
    val got = Expectations.rowReport(df, Seq(
        Expectation("n_positive", col("n") > 0),
        Expectation("lang_known", col("lang").isInCollection(Seq("en", "fr")))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // NULL n fails n_positive via three-valued logic
    assert(got("n_positive") === ((3L, 2L, 0L)))
    assert(got("lang_known") === ((3L, 1L, 0L)))
  }

  test("unique + ref-integrity rules count exactly") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "c"))
      .toDF("id", "v")
    val uniq = Expectations.uniqueReport(df, "id_unique", Seq("id"))
      .head()
    assert(uniq.toSeq === Seq("id_unique", 4L, 1L, 0L))
    val ref = Seq("a", "b").toDF("v")
    val ri = Expectations.refIntegrityReport(df, "v_ref", Seq("v"), ref, Seq("v"))
      .head()
    assert(ri.toSeq === Seq("v_ref", 4L, 1L, 0L))
  }

  test("full report unions all families; all-pass suite is green") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val rep = Expectations.report(df,
      rows = Seq(Expectation("id_positive", col("id") > 0)),
      uniques = Seq(("id_unique", Seq("id"))),
      refs = Seq(("v_ref", Seq("v"), Seq("a", "b").toDF("v"), Seq("v"))))
    val rows = rep.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows === Map("id_positive" -> 1L, "id_unique" -> 1L, "v_ref" -> 1L))
  }
}
