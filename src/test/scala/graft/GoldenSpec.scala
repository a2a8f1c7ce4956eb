package graft

import graft.tools.Golden

/** Pins every oracle-bearing query's sf0.001 result to a golden hash —
  * the between-rounds regression gate the round-5 miss motivated: a
  * semantic drift in any query fails `sbt test` immediately, instead of
  * surfacing as a red CORRECTNESS row at the next driver run. Regenerate
  * after intentional changes with `sbt "runMain graft.tools.GoldenGen"`.
  */
class GoldenSpec extends SparkSpec {

  test("every oracle-bearing query matches its pinned sf0.001 golden hash") {
    val pinned = Golden.readGoldens()
    assert(pinned.nonEmpty, s"no goldens at ${Golden.GoldenPath} — run GoldenGen")
    // every oracle query must be pinned (a new query without a golden is a
    // gate hole), and no stale pins for removed queries
    assert(pinned.keySet === SparkEntry.oracleSql.keySet,
      "goldens out of sync with oracleSql — run GoldenGen; " +
        s"missing=${SparkEntry.oracleSql.keySet -- pinned.keySet} " +
        s"stale=${pinned.keySet -- SparkEntry.oracleSql.keySet}")
    val got = Golden.computeAll(spark)
    val bad = pinned.keySet.toSeq.sorted.flatMap { name =>
      val (pc, ph, pn) = pinned(name)
      val (gc, gh, gn) = got(name)
      if (pc != gc) Some(s"$name: columns $gc != pinned $pc")
      else if (pn != gn) Some(s"$name: rows $gn != pinned $pn")
      else if (ph != gh) Some(s"$name: hash drifted (rows/cols unchanged)")
      else None
    }
    assert(bad.isEmpty, "result drift vs pinned goldens:\n" + bad.mkString("\n"))
  }
}
