package graft.llm

import org.apache.spark.sql.functions._

/** White-box tests of the dedup scale mechanics (package-private seams):
  * per-task pair-volume bounds for degenerate buckets and the star-contraction
  * components' round bound.
  */
class DedupInternalsSpec extends graft.SparkSpec {
  import spark.implicits._

  test("chunkBlocks splits a mega-bucket's pair space into bounded work items") {
    val ids = (0L until 300L).toArray
    val blocks = Dedup.chunkBlocks(ids, chunkSize = 64).toArray
    // 5 chunks (4×64 + 1×44) → 15 blocks: the bucket's quadratic pair space
    // is spread over >1 task instead of serialized through one flatMap
    assert(blocks.length === 15)
    assert(blocks.forall { case (a, b) => a.length <= 64 && b.length <= 64 })
    val perBlock = blocks.map { case (a, b) => Dedup.blockPairs(a, b).size }
    val total = 300 * 299 / 2
    assert(perBlock.sum === total)
    assert(perBlock.max <= 64 * 64, "no single work item may exceed chunkSize² pairs")
    assert(perBlock.max < total, "pair space must not collapse into one item")
  }

  test("pairsWithinBuckets: chunked path is exact on an over-chunkSize bucket") {
    // one planted bucket larger than chunkSize → exercises the block path
    val idx = (0L until 150L).map(id => ("b", id)).toDF("bucket", "id")
    val got = Dedup.pairsWithinBuckets(idx, Seq("bucket"), "id",
        maxBucketSize = 10000, chunkSize = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- 0L until 150L; b <- (a + 1) until 150L
    } yield (a, b)).toSet
    assert(got === want)
  }

  test("pairsWithinBuckets: small and over-chunk buckets coexist; cap drops degenerate buckets") {
    val small = Seq(("s", 1L), ("s", 2L), ("s", 3L))
    val big = (100L until 170L).map(id => ("b", id)) // 70 > chunkSize 32
    val degenerate = (1000L until 1150L).map(id => ("d", id)) // 150 > cap 100
    val idx = (small ++ big ++ degenerate).toDF("bucket", "id")
    val got = Dedup.pairsWithinBuckets(idx, Seq("bucket"), "id",
        maxBucketSize = 100, chunkSize = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.count(p => p._1 < 100) === 3) // (1,2),(1,3),(2,3)
    assert(got.count(p => p._1 >= 100 && p._1 < 1000) === 70 * 69 / 2)
    assert(!got.exists(_._1 >= 1000L), "over-cap bucket must be dropped entirely")
  }

  test("survivorAssignment converges on a 100-node path (diameter >> rounds)") {
    // a chain of overlapping near-dups: plain min-label propagation needs
    // ~100 rounds here; star contraction must converge within the default 30
    val pairs = (0L until 99L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.survivorAssignment(pairs, localThreshold = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 100)
    assert(got.values.forall(_ == 0L), "every chain node must label to the min id")
  }

  test("survivorAssignment: multiple components, self-pairs, exact min labels") {
    val pairs = Seq((5L, 3L), (3L, 9L), (20L, 21L), (21L, 20L), (30L, 31L),
      (40L, 40L)) // degenerate self-pair: still labeled (its own component)
      .toDF("id_a", "id_b")
    val got = Dedup.survivorAssignment(pairs, localThreshold = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L, 40L -> 40L))
  }

  test("hamming64PairsIncremental equals the batch pairs touching fresh ids") {
    // fingerprints chosen so every relation class exists: fresh×fresh dup
    // (10/11), fresh×existing dup (12 vs 1), existing×existing dup (1/2 —
    // must NOT be re-reported), and a distant fresh (13)
    val existing = Seq((1L, 0x00000000000000FFL), (2L, 0x00000000000000FEL),
      (3L, 0x7777000011110000L)).toDF("id", "fp")
    val fresh = Seq((10L, 0x0F0F0F0F00000000L), (11L, 0x0F0F0F0F00000001L),
      (12L, 0x00000000000000F7L), (13L, 0x123456789ABCDEF0L)).toDF("id", "fp")
    val inc = Dedup.hamming64PairsIncremental(fresh, existing, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val freshIds = Set(10L, 11L, 12L, 13L)
    val full = Dedup.hamming64Pairs(fresh.unionByName(existing), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .filter(p => freshIds(p._1) || freshIds(p._2)).toSet
    assert(inc === full)
    assert(inc === Set((10L, 11L, 1L), (1L, 12L, 1L), (2L, 12L, 2L)))
  }

  test("fuzzyCandidates: boilerplate-prefix blocks stay capped at both settings") {
    // 150 length-24 keys share an 8-char boilerplate prefix (the
    // "https://" shape) that is EXACTLY segment slot 0 at maxDist = 2;
    // suffixes are distinct 2-char base-26 codes repeated 8x, so slots 1
    // and 2 are unique per key. Uncapped, the shared-prefix block alone
    // pairs everyone; capped below 150 it drops, and — unlike the old
    // sliding-gram scheme, whose straddle windows kept leaking mod-26
    // collisions — the aligned segment match leaves NOTHING: candidate
    // volume collapses from quadratic to zero
    val n = 150
    // hash-derived suffix chars: non-periodic, so no two keys share a
    // SHIFTED segment by construction (a structured code like "ab"*8
    // would make cyclic shifts into genuine dist-2 matches)
    def key(id: Int): String =
      "PREFIX00" + (0 until 16).map(i => ('a' + java.lang.Math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(s"$id:$i"), 26)).toChar)
        .mkString
    val docs = (0 until n).map(id => (id.toLong, key(id))).toDF("id", "k")
    // ground truth: the hash suffixes put every cross pair far beyond
    // maxDist — the capped candidate set must land exactly on it
    val brute = docs.as("a").join(docs.as("b"), col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.k"), col("b.k")) <= 2).count()
    assert(brute === 0L)
    val slim = Dedup.fuzzySlim(docs, "id", "k")
    def candidates(cap: Int): Set[(Long, Long)] =
      Dedup.fuzzyCandidates(slim, slim, maxDist = 2, maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loose = candidates(10000)
    assert(loose.size === n * (n - 1) / 2)
    assert(candidates(100) === Set.empty[(Long, Long)])
    // the confirm stage is cap-independent here: suffixes differ in far
    // more than 2 chars, so NO candidate survives threshold-Levenshtein
    assert(Dedup.fuzzyNearDupPairs(docs, "id", "k", maxDist = 2,
      maxBucketSize = 10000).count() === 0L)
    assert(Dedup.fuzzyNearDupPairs(docs, "id", "k", maxDist = 2,
      maxBucketSize = 100).count() === 0L)
  }

  test("maximalSharedRuns reports ONE maximal row per shared run, exact positions") {
    // r1..r6 shared (6 tokens > L=3): the 4 window matches on one diagonal
    // must island into a single run of length 6, not 4 window hits
    val docs = Seq(
      (1L, "a b r1 r2 r3 r4 r5 r6 c d"),
      (2L, "e r1 r2 r3 r4 r5 r6")).toDF("doc_id", "text")
    val got = CorpusStats.maximalSharedRuns(docs, "doc_id", "text",
        minRunTokens = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === Set((1L, 2L, 3L, 2L, 6L)))
  }

  test("maximalSharedRuns: multi-occurrence grams split by diagonal; within-doc pairs excluded") {
    // "p q s" occurs twice in doc 1 and once in doc 2: two cross-doc runs
    // (one per diagonal); the doc-1-internal repeat must NOT be a row
    val docs = Seq(
      (1L, "p q s t u p q s"),
      (2L, "p q s z")).toDF("doc_id", "text")
    val got = CorpusStats.maximalSharedRuns(docs, "doc_id", "text",
        minRunTokens = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === Set((1L, 2L, 1L, 1L, 3L), (1L, 2L, 6L, 1L, 3L)))
  }

  test("maximalSharedRuns: maxOccPerSpan drops the boilerplate bucket") {
    val docs = (1L to 4L).map(i => (i, s"m1 m2 m3 k$i")).toDF("doc_id", "text")
    // 4 occurrences of the shared 3-gram > cap 3 → dropped entirely
    assert(CorpusStats.maximalSharedRuns(docs, "doc_id", "text",
      minRunTokens = 3, maxOccPerSpan = 3).count() === 0L)
    // cap lifted: C(4,2) = 6 pair runs of exactly the 3-token gram
    val got = CorpusStats.maximalSharedRuns(docs, "doc_id", "text",
        minRunTokens = 3, maxOccPerSpan = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(got === (for { a <- 1L to 4L; b <- (a + 1) to 4L }
      yield (a, b, 3L)).toSet)
  }

  test("removeDuplicateSubstrings: keep-lowest-id, short docs and within-doc repeats untouched") {
    val docs = Seq(
      (1L, "r1 r2 r3 r4 a"),            // lowest id: keeper, untouched
      (2L, "b r1 r2 r3 r4"),            // shares r1..r4 with doc 1 → cut
      (3L, "c c"),                      // shorter than L → untouched
      (4L, "w1 w2 w3 x w1 w2 w3")       // within-doc repeat only → kept
    ).toDF("doc_id", "text")
    val got = CorpusStats.removeDuplicateSubstrings(docs, "doc_id", "text",
        minRunTokens = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === Set(
      (1L, 5L, 0L, "r1 r2 r3 r4 a"),
      (2L, 5L, 4L, "b"),
      (3L, 2L, 0L, "c c"),
      (4L, 7L, 0L, "w1 w2 w3 x w1 w2 w3")))
  }

  test("bpePieceText segments by merge rank; unknown words pass through whole") {
    val docs = Seq((1L, "alpha beta x-y")).toDF("doc_id", "text")
    // merge 1 fuses a+l, merge 2 fuses the RESULT al+p — rank order
    // matters; "x-y" is outside the [A-Za-z0-9]+ vocabulary contract
    val got = Tokenizer.bpePieceText(docs, "doc_id", "text",
        Seq(("a", "l"), ("al", "p"))).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "alp h a b e t a x-y")))
  }

  test("BPE-level and whitespace-level ExactSubstr cuts DIFFER: sub-word " +
      "units cross the word-count threshold") {
    // two docs share a 2-WORD phrase = 9 BPE pieces (char-level with no
    // merges). At minRunTokens = 6: whitespace dedup sees 2 < 6 shared
    // tokens (no cut); BPE dedup sees 9 >= 6 shared pieces (cut) — the
    // Lee et al. 2022 unit finds duplication word counting cannot
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "alpha beta x")
    ).toDF("doc_id", "text")
    val ws = CorpusStats.removeDuplicateSubstrings(docs, "doc_id", "text",
        minRunTokens = 6).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(ws === Map(1L -> 0L, 2L -> 0L),
      "whitespace level must not cut a 2-token shared phrase")
    val bpe = CorpusStats.removeDuplicateSubstrings(
        Tokenizer.bpePieceText(docs, "doc_id", "text", Seq.empty),
        "doc_id", "bpe_text", minRunTokens = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(bpe === Set(
      (1L, 9L, 0L, "a l p h a b e t a"),
      (2L, 10L, 9L, "x")),
      "BPE level must cut the 9-piece shared run from the higher id")
  }
  test("bandingFor places the S-curve knee at-but-under the threshold") {
    // the MMDS recipe: knee = (1/b)^(1/r). At 128 hashes / t = 0.5 the
    // best admissible split is r = 4 (knee 0.420) — NOT the high-recall
    // r = 2 default (knee 0.125, the measured n² candidate term)
    assert(Dedup.bandingFor(128, 0.5) === ((32, 4)))
    assert(Dedup.bandingFor(96, 0.5) === ((24, 4))) // knee 0.452
    // high thresholds want deep bands
    assert(Dedup.bandingFor(128, 0.9) === ((8, 16))) // knee 0.878
    // a threshold below every knee (here < 1/16) is unreachable; the
    // fallback is the SMALLEST knee (r = 1, knee 1/numHashes) — the
    // maximum-recall split, closest to the requested low threshold
    assert(Dedup.bandingFor(16, 0.01) === ((16, 1)))
    // knees never exceed the threshold (except the documented fallback)
    for (t <- Seq(0.3, 0.5, 0.7, 0.9); nh <- Seq(64, 96, 128, 256)) {
      val (b, r) = Dedup.bandingFor(nh, t)
      assert(b * r === nh)
      if (math.pow(1.0 / nh, 1.0) <= t) // a feasible split exists
        assert(math.pow(1.0 / b, 1.0 / r) <= t + 1e-12,
          s"knee over threshold at nh=$nh t=$t: ($b, $r)")
    }
  }

  test("minhashCandidateCount counts the pre-confirm pair volume") {
    import spark.implicits._
    // two exact copies + one unrelated doc: the copies share every band
    // bucket (identical signatures) yet count ONCE as a distinct pair;
    // the unrelated doc shares no shingles, so no band collision at
    // r = 2 is realistically possible on 3-token vocabulary-disjoint text
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "uno dos tres cuatro cinco seis")
    ).toDF("doc_id", "text")
    val cands = graft.llm.Dedup.minhashCandidateCount(docs, "doc_id", "text")
    assert(cands === 1L, s"expected the copy pair only, got $cands")
    // candidates always dominate confirmed pairs — the confirm stage can
    // only reject
    val confirmed = graft.llm.Dedup.minhashNearDups(docs, "doc_id", "text")
      .count()
    assert(confirmed <= cands && confirmed === 1L)
  }

}
