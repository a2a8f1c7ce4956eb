package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf: latest right row at-or-before left ts, per key; nulls before any") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "t1"),
      (1L, ts("2024-01-01 12:00:00"), "t2"),
      (1L, ts("2024-01-01 09:00:00"), "t0"),
      (2L, ts("2024-01-01 10:00:00"), "u1")
    ).toDF("k", "lts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 200.0),
      (2L, ts("2024-01-01 10:00:00"), 999.0) // tie: inclusive match
    ).toDF("k", "rts", "price")
    val got = Joins.asOf(left, right, "k", "lts", "rts")
      .select($"tag", $"price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1.0 else r.getDouble(1)))
      .toMap
    assert(got === Map("t0" -> -1.0, "t1" -> 100.0, "t2" -> 200.0, "u1" -> 999.0))
  }

  test("asOf: null field in the latest right row is NOT back-filled from older rows") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "x")).toDF("k", "lts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(5.0), 2L),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Double], 9L)
    ).toDF("k", "rts", "price", "qty")
    val row = Joins.asOf(left, right, "k", "lts", "rts")
      .select($"price", $"qty").head()
    // the ts=11:00 row is the match: price must be null (not 5.0 from 09:00)
    assert(row.isNullAt(0), "null field must come from the matched row, not older ones")
    assert(row.getLong(1) === 9L)
  }

  test("saltedJoin rejects join types that would duplicate the replicated side") {
    val df = spark.range(5).toDF("k")
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(df, df, "k", 4, "right")
    }
  }

  test("saltedJoin produces identical results to a plain join") {
    val big = Tables(spark, sf0001).orders.select($"o_orderkey", $"o_custkey")
    val small = Tables(spark, sf0001).customer.select($"c_custkey", $"c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val saltedRows = Joins.saltedJoin(big, small, "o_custkey", 8)
      .select("o_custkey", "o_orderkey", "c_mktsegment").collect().map(_.toSeq).toSet
    val plainRows = big.join(small, "o_custkey")
      .select("o_custkey", "o_orderkey", "c_mktsegment").collect().map(_.toSeq).toSet
    assert(saltedRows === plainRows)
  }

  test("rangeJoinBinned matches the naive theta join, incl. range endpoints") {
    val e = Tables(spark, sf0001).events
      .select($"event_id", $"user_id", unix_micros($"ts").as("tsm"))
    val left = e.select($"event_id".as("lid"), $"user_id", $"tsm".as("lv"))
    val right = e.select($"event_id".as("rid"), $"user_id", $"tsm".as("rv"))
    val win = 10L * 60 * 1000000
    // binWidth deliberately smaller than the range: each left row covers
    // several bins, exercising the explode path
    val binned = Joins.rangeJoinBinned(left, right, Seq("user_id"),
      "lv", "rv", lo = 0L, hi = win, binWidth = win / 3)
      .select("user_id", "lid", "rid").collect().map(_.toSeq).toSet
    val naive = left.join(right, Seq("user_id"))
      .filter($"rv" >= $"lv" && $"rv" <= $"lv" + win)
      .select("user_id", "lid", "rid").collect().map(_.toSeq).toSet
    assert(binned === naive)
    assert(binned.nonEmpty)
  }

  test("rangeJoinBinned plans an equi-join (no nested-loop / cartesian)") {
    val e = Tables(spark, sf0001).events
      .select($"event_id", $"user_id", unix_micros($"ts").as("tsm"))
    val left = e.select($"event_id".as("lid"), $"user_id", $"tsm".as("lv"))
    val right = e.select($"event_id".as("rid"), $"user_id", $"tsm".as("rv"))
    val plan = Joins.rangeJoinBinned(left, right, Seq("user_id"),
      "lv", "rv", 0L, 1000000L, 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in plan:\n$plan")
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
  }

  test("rangeJoinBinned with no keys still equi-joins on the bin") {
    val left = Seq((1L, 100L), (2L, 250L)).toDF("lid", "lv")
    val right = Seq((10L, 120L), (11L, 260L), (12L, 500L)).toDF("rid", "rv")
    val got = Joins.rangeJoinBinned(left, right, Nil, "lv", "rv",
      lo = 0L, hi = 50L, binWidth = 50L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 11L)))
  }

  test("approx_count_distinct stays within rsd of the exact count") {
    val li = Tables(spark, sf0001).lineitem
    val exact = li.select($"l_orderkey").distinct().count()
    val approx = li.agg(approx_count_distinct($"l_orderkey", 0.01)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("approx_percentile tracks the exact percentile within rank tolerance") {
    // lineitem (thousands of rows) with accuracy=100 so n >> accuracy and
    // the sketch actually approximates — on a column smaller than the
    // accuracy the sketch stores every value and the test proves nothing
    val li = Tables(spark, sf0001).lineitem
    val n = li.count()
    assert(n > 1000, "need n >> accuracy for a meaningful approximation test")
    val Array(exact, approx) = li.agg(
      expr("percentile(l_extendedprice, 0.5)"),
      expr("approx_percentile(l_extendedprice, 0.5, 100)")).head()
      .toSeq.map(_.toString.toDouble).toArray
    // rank error ≤ n/accuracy ⇒ compare by RANK, not value: the exact rank
    // of the approx answer must sit within n/100 (+ties slack) of n/2
    val rankOfApprox = li.filter($"l_extendedprice" <= approx).count()
    assert(math.abs(rankOfApprox - n / 2.0) <= n / 100.0 + 1,
      s"approx $approx sits at rank $rankOfApprox of $n (exact median $exact)")
  }

  test("q33's bottom-k sample quantiles track exact ranks; a value-biased sample does not") {
    // the q33 ESTIMATOR (graft's deterministic bottom-k hash sample),
    // exercised where n >> k so it genuinely approximates: lineitem
    // l_extendedprice by l_returnflag at sf0.01 (~20k rows/group, k=32).
    // The q33 pack query itself runs on sf-sized customer groups, where
    // an oracle hash-pass proves determinism but not accuracy — a sample
    // biased by its ordering key would still hash-pass. This pin closes
    // that: the rank of a uniform k-sample's q-quantile is ~N(q·n,
    // n²·q(1−q)/k), so we assert |rank − q·n| ≤ 4·n·√(q(1−q)/k) + ties
    // slack (4 sd ≈ a 6e-5 two-sided miss rate per assertion — and the
    // md5 sample is deterministic, so green here is green forever).
    val li = Tables(spark, sf001).lineitem.select(
      $"l_returnflag".as("g"), $"l_extendedprice".as("v"),
      ($"l_orderkey" * 10 + $"l_linenumber").as("id"))
    val k = 32
    val nByG = li.groupBy($"g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nByG.values.forall(_ > 1000), s"need n >> k=$k, got $nByG")

    def maxRankDev(est: org.apache.spark.sql.DataFrame): Map[(String, Double), Double] = {
      val qs = Seq(0.25 -> "p25", 0.5 -> "median", 0.75 -> "p75")
      est.collect().flatMap { r =>
        val g = r.getString(0)
        qs.map { case (q, cn) =>
          val v = r.getDouble(r.fieldIndex(cn))
          val rank = li.filter($"g" === g && $"v" <= v).count()
          (g, q) -> math.abs(rank - q * nByG(g))
        }
      }.toMap
    }
    def tol(g: String, q: Double): Double =
      4.0 * nByG(g) * math.sqrt(q * (1 - q) / k) + 1

    // green: the real estimator, every (group, quantile) inside the band
    val dev = maxRankDev(
      graft.queries.Relational.bottomKQuantiles(li, "g", k))
    dev.foreach { case ((g, q), d) =>
      assert(d <= tol(g, q), s"group $g q=$q rank deviation $d > ${tol(g, q)}")
    }

    // red: the bias a future edit could introduce — sampling by a key
    // correlated with the VALUE (here v itself: the k smallest values).
    // Its median estimate sits at population rank ~k/2 instead of n/2,
    // far outside the band, proving the pin actually detects sample bias
    val biased = maxRankDev(graft.queries.Relational.bottomKQuantiles(
      li, "g", k, sampleOrder = Seq($"v", $"id")))
    assert(nByG.keys.forall(g => biased((g, 0.5)) > tol(g, 0.5)),
      s"value-ordered sample should violate the rank band: $biased")
  }
}
