package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def cmp(cs: (String, String)*) =
    cs.toDF("winner", "loser")

  /** Literal sequential replay of the documented integer MM recurrence. */
  private def reference(cs: Seq[(String, String)], iters: Int)
      : Map[String, Long] = {
    val clean = cs.filter { case (w, l) => w != l }
    if (clean.isEmpty) Map.empty
    else {
      val pairN = clean.groupBy { case (w, l) =>
        (Seq(w, l).min, Seq(w, l).max)
      }.view.mapValues(_.size.toLong).toMap
      val wins = clean.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        .withDefaultValue(0L)
      val items = clean.flatMap { case (w, l) => Seq(w, l) }.distinct
      var p = items.map(_ -> 1000000L).toMap
      (1 to iters).foreach { _ =>
        val s = items.map { i =>
          i -> pairN.collect {
            case ((lo, hi), n) if lo == i || hi == i =>
              n * 1000000000000L / (p(lo) + p(hi))
          }.sum
        }.toMap
        p = items.map { i =>
          val v = (wins(i) + 1L) * 1000000000000L /
            (s(i) + 1000000000000L / (p(i) + 1000000L))
          i -> math.min(math.max(v, 1000L), 1000000000L)
        }.toMap
      }
      p
    }
  }

  test("btStrengths: dominant item on top, exact hand values on one pair") {
    // a beats b twice, nothing else. Hand-replay of iteration 1 (micro,
    // floor division): pair term = 2*1e12 DIV 2e6 = 1e6 for both sides;
    // anchor = 1e12 DIV 2e6 = 500000.
    //   a: (2+1)*1e12 DIV 1500000 = 2000000
    //   b: (0+1)*1e12 DIV 1500000 =  666666
    val r1 = Ranking.btStrengths(cmp("a" -> "b", "a" -> "b"), "winner",
      "loser", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1("a") === 2000000L)
    assert(r1("b") === 666666L)
    val full = Ranking.btStrengths(cmp("a" -> "b", "a" -> "b"), "winner",
      "loser").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(full("a")._1 > full("b")._1)
    assert(full("a")._2 === 2L && full("b")._2 === 0L) // wins
    assert(full("a")._3 === 2L && full("b")._3 === 2L) // comparisons
  }

  test("btStrengths: strengths order a dominance chain and ignore self-comparisons") {
    // a > b > c with enough games that transitivity must come through;
    // self-rows and a null are dropped, not counted
    val chain = Seq.fill(4)("a" -> "b") ++ Seq.fill(4)("b" -> "c") ++
      Seq(("a", "a"), (null: String, "b"))
    val r = Ranking.btStrengths(chain.toDF("winner", "loser"), "winner",
      "loser").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r.keySet === Set("a", "b", "c"))
    assert(r("a") > r("b") && r("b") > r("c"))
    // the anchor regularization keeps every strength positive
    assert(r("c") > 0L)
  }

  test("btStrengths: order-independence — shuffled log, same strengths") {
    val log = Seq("x" -> "y", "y" -> "z", "x" -> "z", "z" -> "y", "x" -> "y")
    val a = Ranking.btStrengths(cmp(log: _*), "winner", "loser")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Ranking.btStrengths(
        cmp(scala.util.Random.shuffle(log): _*).repartition(7),
        "winner", "loser")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("property: btStrengths equals the sequential reference on random logs") {
    val rnd = new scala.util.Random(47)
    (1 to 8).foreach { trial =>
      val nItems = 2 + rnd.nextInt(8)
      val ids = (0 until nItems).map(i => s"m$i")
      val log = (1 to 10 + rnd.nextInt(40)).map { _ =>
        (ids(rnd.nextInt(nItems)), ids(rnd.nextInt(nItems)))
      }
      val got = Ranking.btStrengths(cmp(log: _*), "winner", "loser")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === reference(log, 5), s"trial $trial")
    }
  }

  test("per-item win count beyond the numerator bound fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Ranking.btStrengths(cmp(Seq.fill(4)("a" -> "b"): _*), "winner",
        "loser", maxWinsPerItem = 3L)
    }
    assert(e.getMessage.contains("numerator bound"))
  }
}
