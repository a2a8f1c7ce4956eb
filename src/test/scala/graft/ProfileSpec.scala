package graft

import graft.etl.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact ndv, typed min/max normalization") {
    val df = Seq(
      (1L, Some(2.5), Some("b")),
      (2L, None, Some("a")),
      (3L, Some(10.0), None),
      (3L, Some(2.5), Some("a"))
    ).toDF("k", "x", "s")
    val out = Profile.profile(df).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(out("k") === ((0L, 3L, "1", "3")))
    // numeric min/max, not lexicographic: 2.5 < 10.0
    assert(out("x") === ((1L, 2L, "2.5000", "10.0000")))
    assert(out("s") === ((1L, 2L, "a", "b")))
  }

  test("profile: column subset and stable positions") {
    val df = Seq((1, "a")).toDF("i", "s")
    val out = Profile.profile(df, Seq("s", "i")).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((0L, "s"), (1L, "i")))
  }

  test("profile rejects unknown columns") {
    val df = Seq((1, "a")).toDF("i", "s")
    intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("nope"))
    }
  }
}
