package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy dedup: hand-computed pairs, EXACT recall vs the
  * brute-force distance join (the PassJoin disjoint-segment pigeonhole),
  * the short/long boundary overlap, bucket-cap behavior, and applied
  * survivors.
  */
class FuzzyDedupSpec extends SparkSpec {
  import spark.implicits._

  private def brute(df: org.apache.spark.sql.DataFrame, maxDist: Int) = {
    val k = df.select(col("id"), col("key"))
    k.as("a").join(k.as("b"), col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.key"), col("b.key")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist"))
  }

  test("hand-computed typo pairs at maxDist=2") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),   // dist 0
      (3L, "the quick briwn fox jumps"),   // 1 substitution
      (4L, "the quick brown foxx jumps"),  // 1 insertion
      (5L, "a completely different key!!")
    ).toDF("id", "key")
    val got = Dedup.fuzzyNearDupPairs(docs, "id", "key", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 0L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 2L)))
  }

  test("exact recall: blocked pairs equal the brute-force join") {
    // mixed lengths straddling the sLo=24 / sHi=26 overlap window,
    // plus typo families and unrelated keys
    val base = "abcdefgh" * 5
    val docs = (1L to 30L).map { i =>
      val k = i % 6 match {
        case 0 => base.take(23)                       // short side
        case 1 => base.take(25)                       // overlap band
        case 2 => base.take(27)                       // gram side
        case 3 => base.take(25).updated(3, 'Z').mkString // 1 sub of case-1
        case 4 => s"totally unrelated key $i ${"x" * (i % 7).toInt}"
        case _ => base.take(23) + "Q"                 // 1 insert of case-0
      }
      (i, k)
    }.toDF("id", "key")
    val got = Dedup.fuzzyNearDupPairs(docs, "id", "key", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = brute(docs, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(want.nonEmpty) // the fixture actually exercises matches
  }

  test("short keys still pair across the length-band boundary") {
    // len 23 vs len 25: the shorter is below sLo, the longer sits in the
    // overlap band — they must meet through the shared sentinel block
    val docs = Seq((1L, "a" * 23), (2L, "a" * 25)).toDF("id", "key")
    val got = Dedup.fuzzyNearDupPairs(docs, "id", "key", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 2L)))
  }

  test("multi-match-aware probe selection: ~3x fewer probe rows, identical pairs") {
    // PassJoin §4.2 (r10 ask #7): at d = 2 the naive probe set is
    // 5 lengths × 3 slots × 5 shifts = 75 rows per key; the
    // multi-match-aware windows admit at most ~19 (Σ over Δ of the
    // [max(−j, Δ−(d−j)), min(j, Δ+(d−j))] window sizes). Pin the volume
    // well under the naive bound AND re-assert exact recall on the same
    // corpus, so a window-math mistake cannot trade completeness for
    // speed silently.
    val docs = (1L to 20L).map(i =>
      (i, f"k$i%02d" + "abcdefgh" * 3)).toDF("id", "key")
    val slim = Dedup.fuzzySlim(docs, "id", "key")
    val nProbes = Dedup.fuzzyProbes(slim, 2).count()
    assert(nProbes <= 20L * 25,
      s"probe volume regressed toward the naive set: $nProbes rows")
    val got = Dedup.fuzzyNearDupPairs(docs, "id", "key", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = brute(docs, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("maxBucketSize drops degenerate blocks instead of exploding") {
    val docs = ((1L to 50L).map(i => (i, "identical prefix everywhere")) :+
      (99L, "one different key here!!")).toDF("id", "key")
    val capped = Dedup.fuzzyNearDupPairs(docs, "id", "key", maxDist = 2,
      maxBucketSize = 10)
    assert(capped.count() === 0L) // every block over the cap is dropped
    val uncapped = Dedup.fuzzyNearDupPairs(docs, "id", "key", maxDist = 2)
    assert(uncapped.count() === 50L * 49 / 2)
  }

  test("incremental pairs equal batch-over-union pairs touching fresh ids") {
    val base = "abcdefgh" * 4
    val existing = (1L to 12L).map { i =>
      (i, if (i % 3 == 0) base else s"existing key number $i ${"y" * (i % 5).toInt}")
    }.toDF("id", "key")
    val fresh = Seq(
      (101L, base),                                  // matches existing %3 family
      (102L, base.updated(5, 'Q').mkString),         // 1 sub of the family
      (103L, "a brand new fresh key!!"),
      (104L, "a brand new fresh key!!")              // fresh×fresh pair
    ).toDF("id", "key")
    val inc = Dedup.fuzzyNearDupPairsIncremental(fresh, existing, "id", "key",
        maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val freshIds = Set(101L, 102L, 103L, 104L)
    val batch = Dedup.fuzzyNearDupPairs(existing.unionByName(fresh), "id",
        "key", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      .filter(p => freshIds(p._1) || freshIds(p._2))
    assert(inc === batch)
    assert(inc.contains((103L, 104L, 0L))) // within-batch pair present
    assert(inc.exists(p => p._1 <= 12L))   // cross-index pair present
  }

  test("dropFuzzyDuplicates keeps the min-id survivor per family") {
    val docs = Seq(
      (5L, "the quick brown fox jumps"),
      (2L, "the quick browm fox jumps"),
      (9L, "the quick brown fox jumpz"),
      (7L, "some other document key!!")
    ).toDF("id", "key")
    val kept = Dedup.dropFuzzyDuplicates(docs, "id", "key", maxDist = 2)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(2L, 7L))
  }
}
