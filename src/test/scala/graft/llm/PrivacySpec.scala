package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Privacy operators: hand-computed k-anonymity / l-diversity with NULL
  * quasi-identifiers and NULL sensitive values, ladder generalization
  * with negative floor alignment and the coarsest-width fallback.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    (1L, Some("us"), "a"), (2L, Some("us"), "a"), (3L, Some("us"), "a"),
    (4L, Some("de"), "b"), (5L, Some("de"), "b"),
    (6L, None, "b"), (7L, None, "b")
  ).toDF("id", "country", "seg")

  test("kAnonymity counts NULL quasi-identifiers as one group") {
    val got = Privacy.kAnonymity(people, Seq("country", "seg"), k = 3)
      .select($"id", $"qi_group_n", $"k_anon")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got === Map(
      1L -> (3L, true), 2L -> (3L, true), 3L -> (3L, true),
      4L -> (2L, false), 5L -> (2L, false),
      6L -> (2L, false), 7L -> (2L, false)))
    val kept = Privacy.suppressSmallGroups(people, Seq("country", "seg"), 3)
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L))
  }

  test("lDiversity counts distinct NON-NULL sensitive values, null-safe join") {
    val t = Seq(
      (1L, "us", Some(10L)), (2L, "us", Some(20L)), (3L, "us", Some(10L)),
      (4L, "de", Some(30L)), (5L, "de", None),
      (6L, null.asInstanceOf[String], None) // all-null sensitive group
    ).toDF("id", "country", "diag")
    val got = Privacy.lDiversity(t, Seq("country"), "diag", l = 2)
      .select($"id", $"l_div", $"l_ok")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got === Map(
      1L -> (2L, true), 2L -> (2L, true), 3L -> (2L, true),
      4L -> (1L, false), 5L -> (1L, false),
      6L -> (0L, false)))
  }

  test("generalizeToK picks the smallest ladder width that reaches k") {
    // one QI group, values 0..3: width 1 and 2 give groups of 1 and 2,
    // width 4 collapses all four rows into bucket 0
    val t = Seq((1L, "g", 0L), (2L, "g", 1L), (3L, "g", 2L), (4L, "g", 3L))
      .toDF("id", "grp", "v")
    val out = Privacy.generalizeToK(t, Seq("grp"), "v", k = 4, maxExp = 8)
    assert(out.select($"gen_width").distinct().as[Long].collect().toSeq
      === Seq(4L))
    assert(out.select($"qi_bucket").distinct().as[Long].collect().toSeq
      === Seq(0L))
  }

  test("dpNoisyCounts replays the PRF + staged-log reference bit-exactly") {
    import graft.functions.PortableMath
    val df = ((1 to 24).map(i => (s"g${i % 8}", i))).toDF("g", "v")
    val eps = 500000L
    val got = Privacy.dpNoisyCounts(df, Seq("g"), eps, seed = "s")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ref(g: String, n: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((g + "" + "s").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val r = java.lang.Long.parseLong(hex.substring(0, 12), 16) + 1
      val lp = PortableMath.microLnRef(r, 1L << 48)
      val sign = if (Integer.parseInt(hex.substring(12, 13), 16) % 2 == 1) 1 else -1
      n + sign * ((0 - lp) / eps)
    }
    (0 until 8).foreach { i =>
      assert(got(s"g$i") === ((3L, ref(s"g$i", 3L))), s"group g$i")
    }
    // the Laplace tail is real: across 8 groups some noise is nonzero
    assert(got.values.exists { case (n, nn) => nn != n },
      s"all noise rounded to zero: $got")
    // a different seed re-keys the PRF: some group's noise must move
    val reseeded = Privacy.dpNoisyCounts(df, Seq("g"), eps, seed = "s2")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(reseeded != got.map { case (g, (_, nn)) => g -> nn })
  }

  test("generalizeToK floor-aligns negatives and falls back to the coarsest width") {
    // negative floor alignment: -1 at width 4 buckets to -4, not 0
    val neg = Seq((1L, "g", -1L), (2L, "g", -2L), (3L, "g", -3L), (4L, "g", -4L))
      .toDF("id", "grp", "v")
    val out = Privacy.generalizeToK(neg, Seq("grp"), "v", k = 4, maxExp = 8)
    assert(out.select($"gen_width").head().getLong(0) === 4L)
    assert(out.select($"qi_bucket").distinct().as[Long].collect().toSet
      === Set(-4L))
    // unreachable k: two QI groups of one row each can never both reach
    // k=2 by widening the value — the coarsest ladder width is reported
    val lone = Seq((1L, "a", 0L), (2L, "b", 1L)).toDF("id", "grp", "v")
    val fb = Privacy.generalizeToK(lone, Seq("grp"), "v", k = 2, maxExp = 6)
    assert(fb.select($"gen_width").head().getLong(0) === (1L << 6))
  }
}
