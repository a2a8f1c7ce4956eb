package graft

import graft.ml.{Features, Scoring}
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {
  import spark.implicits._

  test("standardize: zero mean, unit variance per group; constant group → 0") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "x")
    val z = Features.standardize(df, "g", "x", "z")
      .select($"g", $"z").collect().map(r => (r.getString(0), r.getDouble(1)))
    val as = z.filter(_._1 == "a").map(_._2).sorted
    assert(math.abs(as.sum) < 1e-12)
    assert(math.abs(as.map(v => v * v).sum / 3 - 1.0) < 1e-9)
    assert(z.filter(_._1 == "b").forall(_._2 === 0.0))
  }

  test("minMaxScale maps group min→0, max→1; constant group → 0") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 7.0))
      .toDF("g", "x")
    val m = Features.minMaxScale(df, "g", "x", "m")
      .select($"x", $"m").collect().map(r => r.getDouble(0) -> r.getDouble(1))
      .toMap
    assert(m(10.0) === 0.0 && m(30.0) === 1.0 && m(20.0) === 0.5)
    assert(m(7.0) === 0.0)
  }

  test("categoryIndex: value-ordered 0-based ranks and category count") {
    val df = Seq("c", "a", "b", "a").map(Tuple1(_)).toDF("cat")
    val out = Features.categoryIndex(df, "cat", "idx")
      .select($"cat", $"idx", $"idx_n").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(out.toSeq === Seq(("a", 0L, 3L), ("b", 1L, 3L), ("c", 2L, 3L)))
  }

  test("tree scoring routes rows to the declared leaves; NULL goes right") {
    val tree = Scoring.Split("x", 10.0,
      Scoring.Leaf(0, 0.1), Scoring.Leaf(1, 0.9))
    val df = Seq(Some(5.0), Some(15.0), None).toDF("x")
    val out = Scoring.scoreTree(df, tree, "p")
      .select($"p_leaf", $"p").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq === Seq((0L, 0.1), (1L, 0.9), (1L, 0.9)))
  }

  test("fused scorers are map-only: zero exchanges, whole-stage codegen") {
    val li = Tables(spark, sf0001).lineitem
    Seq(
      Scoring.scoreLinear(li, Seq("l_quantity" -> 0.05), -0.6, "s"),
      Scoring.scoreTree(li, Scoring.Split("l_quantity", 25.0,
        Scoring.Leaf(0, 0.2), Scoring.Leaf(1, 0.8)), "p")
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(400))
      // the "*(n)" operator prefix is the short-form WholeStageCodegen marker
      assert(plan.contains("*(1)"), plan.take(400))
    }
  }

  test("linearSql/treeSql mirror the Column semantics on a sample") {
    // the SQL twins are what the oracles interpolate — drive them through
    // spark.sql against the same rows and compare bit-for-bit
    val df = Seq((1.0, 0.02), (30.0, 0.07), (12.5, 0.05)).toDF("a", "b")
    df.createOrReplaceTempView("ml_twin_probe")
    val w = Seq("a" -> 0.05, "b" -> -3.0)
    val viaCol = Scoring.scoreLinear(df, w, -0.6, "s")
      .select($"s").as[Double].collect().toSeq
    val viaSql = spark.sql(
      s"SELECT ${Scoring.linearSql(w, -0.6)} AS s FROM ml_twin_probe")
      .as[Double].collect().toSeq
    assert(viaCol === viaSql)
  }

  test("standardize/minMaxScale/categoryIndex: NULL group is a group, NULL value stays NULL") {
    // (group, value): NULL-group rows must survive the stats rejoin with
    // their own statistics; NULL values must not bias the mean (SQL AVG
    // semantics) and must scale to NULL, not 0
    val df = Seq[(Option[String], Option[Double], Long)](
      (Some("a"), Some(1.0), 1L), (Some("a"), Some(3.0), 2L),
      (Some("a"), None, 3L),
      (None, Some(10.0), 4L), (None, Some(20.0), 5L))
      .toDF("g", "x", "id")
    val z = Features.standardize(df, "g", "x", "z")
      .select($"id", $"z").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(z.keySet === Set(1L, 2L, 3L, 4L, 5L), "rows were dropped")
    // group a: non-null mean 2, sigma 1 (NULL excluded from both)
    assert(z(1L) === Some(-1.0) && z(2L) === Some(1.0))
    assert(z(3L) === None, "NULL value must standardize to NULL")
    // NULL group: mean 15, sigma 5
    assert(z(4L) === Some(-1.0) && z(5L) === Some(1.0))
    val m = Features.minMaxScale(df, "g", "x", "m")
      .select($"id", $"m").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(m(1L) === Some(0.0) && m(2L) === Some(1.0) && m(3L) === None)
    assert(m(4L) === Some(0.0) && m(5L) === Some(1.0))
    val c = Features.categoryIndex(df.select($"id", $"g"), "g", "gi")
      .select($"id", $"gi").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // NULL sorts first → index 0; "a" → 1; nobody dropped
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
  }
}
