package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(es: (Long, Long)*) =
    es.toDF("id_a", "id_b")

  test("pageRankCentrality: star center outranks leaves, exact hand values") {
    // star 1-2, 1-3, 1-4: center deg 3, leaves deg 1.
    // Hand-replay of one iteration (micro, floor division):
    //   center gets 3 leaves * (1e6 DIV 1) = 3e6 -> 150000 + 2550000 = 2700000
    //   each leaf gets 1e6 DIV 3 = 333333 -> 150000 + 283333 = 433333
    val r1 = Graph.pageRankCentrality(pairs(1L -> 2L, 1L -> 3L, 1L -> 4L),
      iterations = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(1L) === 2700000L)
    assert(r1(2L) === 433333L && r1(3L) === 433333L && r1(4L) === 433333L)
    // more rounds keep the center strictly on top
    val r5 = Graph.pageRankCentrality(pairs(1L -> 2L, 1L -> 3L, 1L -> 4L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r5(1L) > r5(2L) && r5(2L) === r5(3L) && r5(3L) === r5(4L))
  }

  test("pageRankCentrality: symmetric dedup of reversed/duplicate pairs, self-pairs dropped") {
    // same edge listed twice + reversed + a self-pair must equal the clean graph
    val noisy = Graph.pageRankCentrality(
      pairs(1L -> 2L, 2L -> 1L, 1L -> 2L, 3L -> 3L, 2L -> 3L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clean = Graph.pageRankCentrality(pairs(1L -> 2L, 2L -> 3L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(noisy === clean)
    assert(!noisy.contains(4L)) // self-pair-only / absent nodes excluded
    // path 1-2-3: middle node is the hub
    assert(clean(2L) > clean(1L) && clean(1L) === clean(3L))
  }

  test("property: pageRankCentrality equals a sequential reference on random graphs") {
    val rnd = new scala.util.Random(31)
    (1 to 8).foreach { trial =>
      val nNodes = 2 + rnd.nextInt(30)
      val es = (1 to 2 * nNodes).map(_ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
      val got = Graph.pageRankCentrality(pairs(es: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // literal sequential replay of the documented integer recurrence
      val undirected = es.flatMap { case (u, v) => Seq((u, v), (v, u)) }
        .filter { case (u, v) => u != v }.distinct
      if (undirected.isEmpty) assert(got.isEmpty, s"trial $trial")
      else {
        val adj = undirected.groupBy(_._1).view
          .mapValues(_.map(_._2)).toMap
        val deg = adj.view.mapValues(_.size.toLong).toMap
        var r = adj.keys.map(_ -> 1000000L).toMap
        (1 to 5).foreach { _ =>
          val in = adj.keys.map { n =>
            n -> adj(n).map(nb => r(nb) / deg(nb)).sum
          }.toMap
          r = adj.keys.map(n => n -> (150000L + 850000L * in(n) / 1000000L))
            .toMap
        }
        assert(got === r, s"trial $trial nodes=$nNodes")
        // mass sanity: damped total stays near the node count
        assert(got.values.sum > 0)
      }
    }
  }

  test("applySurvivorsKeepCentral keeps the family hub, not the min id") {
    // family {1,2,3,9}: 9 is the hub (linked to all); min-id policy would
    // keep 1, centrality policy must keep 9. Node 7 is untouched.
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "d"), (7L, "solo"))
      .toDF("doc_id", "text")
    val p = pairs(9L -> 1L, 9L -> 2L, 9L -> 3L)
    val kept = Dedup.applySurvivorsKeepCentral(corpus, "doc_id", p)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(9L, 7L))
  }

  test("node count beyond the accumulator bound fails loudly, not silently") {
    // the ~1e7 default bound is the documented 2^63 overflow limit; prove
    // the guard trips by lowering maxNodes below a small graph's node count
    val p = pairs(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val e = intercept[IllegalArgumentException] {
      Graph.pageRankCentrality(p, iterations = 1, maxNodes = 3L)
    }
    assert(e.getMessage.contains("accumulator bound"))
    // at the default bound the same graph ranks fine
    assert(Graph.pageRankCentrality(p, iterations = 1).count() == 5L)
  }
}
