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
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5), r.getString(6)))).toMap
    assert(out("k") === ((4L, 0L, 3L, "1", "3")))
    // numeric min/max, not lexicographic: 2.5 < 10.0
    assert(out("x") === ((4L, 1L, 2L, "2.5000", "10.0000")))
    assert(out("s") === ((4L, 1L, 2L, "a", "b")))
  }

  test("drift flags null-fraction and ndv-density shifts, passes stable data") {
    val base = Seq.tabulate(100)(i => (i.toLong, Some(s"v$i"))).toDF("k", "s")
    val same = Seq.tabulate(50)(i => (i.toLong, Some(s"w$i"))).toDF("k", "s")
    // half the values null, strings collapsed to 2 distinct
    val bad = Seq.tabulate(50)(i =>
      (i.toLong, if (i % 2 == 0) None else Some(s"c${i % 2}"))).toDF("k", "s")
    val pb = Profile.profile(base)
    assert(Profile.drift(Profile.profile(same), pb).count() === 0)
    val flagged = Profile.drift(Profile.profile(bad), pb)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(flagged.contains(("s", "null_fraction")))
    assert(flagged.contains(("s", "ndv_density")))
    assert(!flagged.exists(_._1 == "k"), s"stable column flagged: $flagged")
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

  test("applySaltPlan: salted join equals plain join; heavy keys scatter") {
    import spark.implicits._
    // key "hot" is 40× heavier than the rest
    val probe = ((1L to 40L).map(i => (i, "hot")) ++
      Seq((101L, "a"), (102L, "b"))).toDF("row_id", "k")
    val build = Seq(("hot", 10L), ("a", 20L), ("b", 30L), ("c", 40L))
      .toDF("k", "v")
    val plan = Profile.saltPlan(probe, Seq("k"), targetPerKey = 10L)
    assert(plan.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("hot", 40L, 4L)))
    val (p, b) = Profile.applySaltPlan(probe, build, plan, Seq("k"),
      "row_id")
    val salted = p.join(b, Seq("k", "__salt"))
      .select($"row_id", $"k", $"v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val plain = probe.join(build, Seq("k"))
      .select($"row_id", $"k", $"v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(salted === plain && plain.size === 42)
    // the hot key really scatters: more than one salt value in use, and
    // no (key, salt) cell above ceil(40/4) + slack
    val cells = p.filter($"k" === "hot").groupBy($"__salt").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells.size > 1)
    assert(cells.values.max <= 20L) // hash balance, generous bound
    // light keys stay salt-0 on both sides
    assert(p.filter($"k" === "a").head().getAs[Long]("__salt") === 0L)
    assert(b.filter($"k" === "a").count() === 1L)
    assert(b.filter($"k" === "hot").count() === 4L)
  }

  test("skewReport: hand Gini, even distribution, single key, NULL key, empty guard") {
    import spark.implicits._
    def report(df: org.apache.spark.sql.DataFrame, keys: Seq[String]) =
      Profile.skewReport(df, keys).head().toSeq.map(_.asInstanceOf[Long])
    // counts {a:1, b:1, c:2}: sorted [1,1,2] → Σi·c = 9,
    // G = (18 − 16)/12 = 1/6; mean = 4e6/3; top1 = 2e6/4
    assert(report(Seq("a", "b", "c", "c").toDF("k"), Seq("k")) ===
      Seq(4L, 3L, 2L, 1L, 1333333L, 500000L, 166666L))
    // perfectly even {x:2, y:2} → Gini 0
    assert(report(Seq("x", "x", "y", "y").toDF("k"), Seq("k"))(6) === 0L)
    // a single key is trivially even
    assert(report(Seq("z", "z").toDF("k"), Seq("k")) ===
      Seq(2L, 1L, 2L, 2L, 2000000L, 1000000L, 0L))
    // NULL keys group as their own key
    assert(report(Seq(Some("a"), None, None).toDF("k"), Seq("k"))(1) === 2L)
    // empty input refuses loudly
    val e = intercept[IllegalArgumentException] {
      Profile.skewReport(Seq.empty[String].toDF("k"), Seq("k"))
    }
    assert(e.getMessage.contains("empty"))
  }

  test("giniByGroup: hand values per group, tie-order invariance, " +
      "single-value groups pin 0") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 1L), ("a", 1L, 2L), ("a", 1L, 3L), // even → 0
      ("b", 0L, 1L), ("b", 0L, 2L), ("b", 10L, 3L), // (2·30 − 4·10)/30
      ("c", 7L, 1L) // single row → 0
    ).toDF("g", "v", "id")
    val out = Profile.giniByGroup(df, "g", "v", "id").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") === ((3L, 3L, 0L)))
    assert(out("b") === ((3L, 10L, 666666L)))
    assert(out("c") === ((1L, 7L, 0L)))
    // value ties may rank in any internal order without moving Σ i·v —
    // permute the tie column and the coefficient must not change
    val permuted = Seq(("b", 0L, 9L), ("b", 10L, 1L), ("b", 0L, 5L))
      .toDF("g", "v", "id")
    assert(Profile.giniByGroup(permuted, "g", "v", "id")
      .head().getLong(3) === 666666L)
    // reserved working columns refuse loudly
    val e = intercept[IllegalArgumentException] {
      Profile.giniByGroup(df.withColumnRenamed("v", "__gv"), "g", "__gv",
        "id")
    }
    assert(e.getMessage.contains("reserved"))
  }
}
