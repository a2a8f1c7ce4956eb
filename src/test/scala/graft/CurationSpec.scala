package graft

import graft.functions.PortableMath
import graft.llm.{CorpusStats, Mixture, Retrieval, Similarity, TextOps, Tokenizer}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Specs for the curation-loop operators: BM25 retrieval, UniMax budget
  * allocation, BPE merge mining, deterministic integer k-means, and the
  * signed portable log they build on.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---------------------------------------------------------------- ln

  test("property: signed microLn SQL stages match the JVM reference on both sides of 1") {
    val pairGen: Gen[(Long, Long)] = for {
      a <- Gen.choose(1L, 100000000L)
      b <- Gen.choose(1L, 100000000L)
    } yield (a, b)
    // include idf-shaped pairs (a > b guaranteed) and exact-equal pairs
    val idf = (0L until 300L).map(df => (2L * 10000 + 2, 2 * df + 1))
    val eq = Seq((1L, 1L), (7L, 7L), (1L << 50, 1L << 50))
    val all = (sample(pairGen, 2000) ++ idf ++ eq).distinct
    val expect = all.map { case (a, b) =>
      (a, b, PortableMath.microLnSignedRef(a, b))
    }
    val stages = PortableMath.microLnSignedStages(
      "a", "b", PortableMath.sparkShiftLeft)
    val got = stages.foldLeft(all.toDF("a", "b")) {
        case (d, (n, s)) => d.withColumn(n, expr(s))
      }
      .select($"a", $"b", $"lp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq.sorted === expect.sorted)
    // semantics: within fixed-point granularity of the true log
    expect.foreach { case (a, b, lp) =>
      val t = math.log(a.toDouble / b)
      assert(math.abs(t - lp / 1e6) <= 1.000001e-6, s"($a,$b): lp=$lp true=$t")
    }
  }

  // -------------------------------------------------------------- bm25

  test("bm25TopK matches an exact single-machine reference on a small corpus") {
    val docs = Seq(
      (1L, "hash join hash join merge"),
      (2L, "table scan filter scan scan"),
      (3L, "hash table vector"),
      (4L, "join join join join join join join join"),
      (5L, "spark"),
      (6L, "merge vector batch batch"))
    val df = docs.toDF("doc_id", "text")
    val queries = Seq("qa" -> "hash join", "qb" -> "scan vector")
    val got = Retrieval.bm25TopK(df, "doc_id", "text", queries, k = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

    // independent reference: same integer formulas, plain Scala collections
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = docs.size.toLong
    val t = toks.values.map(_.size.toLong).sum
    val dl = toks.map { case (id, s) => id -> s.size.toLong }
    val dfOf = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val expect = queries.flatMap { case (qid, qtext) =>
      val scores = toks.keys.toSeq.flatMap { id =>
        val terms = qtext.split("\\s+").distinct.toSeq
          .filter(w => toks(id).contains(w))
        if (terms.isEmpty) None
        else {
          val s = terms.map { w =>
            val tf = toks(id).count(_ == w)
            val idf = PortableMath.microLnSignedRef(2 * n + 2, 2 * dfOf(w) + 1)
            val num = 44 * t * tf
            val den = 20 * t * tf + 6 * t + 18 * dl(id) * n
            idf * num / den
          }.sum
          Some((id, terms.size.toLong, s))
        }
      }
      scores.sortBy { case (id, _, s) => (-s, id) }.take(3).zipWithIndex
        .map { case ((id, nt, s), i) => (qid, id, nt, s, i + 1L) }
    }.toSet
    assert(got === expect)
  }

  test("bm25TopK ranks a term-stuffed doc below short exact matches only via saturation, never negatively") {
    val got = Retrieval.bm25TopK(
      Tables(spark, sf0001).documents, "doc_id", "text",
      Seq("q" -> "hash join"), k = 20).collect()
    assert(got.nonEmpty)
    // scores positive (Lucene idf form), ranks contiguous from 1, sorted
    val ranks = got.map(_.getLong(4)).sorted
    assert(ranks.toSeq === (1L to got.length).toSeq)
    val byRank = got.sortBy(_.getLong(4)).map(_.getLong(3))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    assert(got.forall(_.getLong(3) > 0))
  }

  test("reserved-name guards reject output-column idCols; malformed index fails fast") {
    // Retrieval: an idCol equal to an OUTPUT column (not just a working one)
    // must be rejected at construction, not surface as ambiguity downstream
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(Seq((1L, "a b")).toDF("score_micro", "text"),
        "score_micro", "text", Seq("q" -> "a"), 3)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25Index(Seq((1L, "a b")).toDF("query_id", "text"),
        "query_id", "text")
    }
    // TextOps trio
    intercept[IllegalArgumentException] {
      TextOps.tokenEntropy(Seq((1L, "a")).toDF("entropy_micro", "text"),
        "entropy_micro", "text")
    }
    intercept[IllegalArgumentException] {
      TextOps.winnowFingerprints(Seq((1L, "a")).toDF("fingerprint", "text"),
        "fingerprint", "text")
    }
    intercept[IllegalArgumentException] {
      TextOps.blocklistCounts(Seq((1L, "a")).toDF("blocked", "text"),
        "blocked", "text", Seq("a"))
    }
    // an index without the sentinel totals must fail loudly, not emit NULL
    // scores for every row
    val docs = Seq((1L, "hash join"), (2L, "scan")).toDF("doc_id", "text")
    val badIndex = Seq(("hash", 1L)).toDF("term", "df")
    val ex = intercept[Exception] {
      Retrieval.bm25ScoreAgainstIndex(docs, "doc_id", "text",
        Seq("q" -> "hash"), badIndex).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("malformed BM25 index")),
      s"unexpected failure: $ex")
  }

  // ------------------------------------------------------------ unimax

  test("property: unimax allocation matches a sequential waterfill and exhausts min(budget, caps)") {
    val caseGen: Gen[(Seq[Long], Long, Long)] = for {
      k <- Gen.choose(1, 12)
      ns <- Gen.listOfN(k, Gen.choose(1L, 10000L))
      e <- Gen.choose(1L, 4L)
      b <- Gen.choose(0L, 60000L)
    } yield (ns, e, b)
    sample(caseGen, 60).zipWithIndex.foreach { case ((ns, e, b), ci) =>
      val df = ns.zipWithIndex
        .flatMap { case (n, i) => Seq((f"g$i%02d", n)) }
        .toDF("grp", "ntok")
      val got = Mixture.unimaxAllocation(df, "grp", col("ntok"), e, _ => b)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .sortBy(_._1)

      // reference: literal sequential waterfill
      val sorted = ns.zipWithIndex
        .map { case (n, i) => (f"g$i%02d", n, e * n) }
        .sortBy { case (g, _, cap) => (cap, g) }
      var rem = b
      var left = sorted.size.toLong
      var i = 0
      while (i < sorted.size && sorted(i)._3 * left <= rem) {
        rem -= sorted(i)._3; left -= 1; i += 1
      }
      val w = if (left == 0) 0L else rem / left
      val r = if (left == 0) 0L else rem % left
      val expect = sorted.zipWithIndex.map { case ((g, n, cap), j) =>
        val alloc = if (j < i) cap else w + (if (j - i < r) 1L else 0L)
        (g, n, cap, alloc, alloc * 1000000L / n)
      }.sortBy(_._1)
      assert(got.toSeq === expect, s"case $ci: ns=$ns e=$e b=$b")
      // invariants: per-group cap respected; total = min(budget, sum of caps)
      assert(got.forall { case (_, _, cap, alloc, _) => alloc <= cap })
      assert(got.map(_._4).sum === math.min(b, sorted.map(_._3).sum),
        s"case $ci under/over-allocates")
    }
  }

  test("unimaxSelect materializes exactly the greedy hash-prefix of each allocation") {
    val docs = (1L to 60L).map { i =>
      val grp = if (i % 3 == 0) "big" else "small"
      // big-group docs are 8 tokens, small are 2 — forces big uncapped
      val text = Seq.fill(if (grp == "big") 8 else 2)("w").mkString(" ")
      (i, grp, text)
    }
    val df = docs.toDF("doc_id", "grp", "text")
    val e = 1L
    val budgetOf: Long => Long = t => t / 2
    val kept = Mixture.unimaxSelect(df, "grp",
        graft.llm.TextOps.tokenCount(col("text")), e, budgetOf, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // reference: allocation from the operator, selection by literal greedy
    // walk in (md5(id), id) order per group
    val alloc = Mixture.unimaxAllocation(df, "grp",
        graft.llm.TextOps.tokenCount(col("text")), e, budgetOf)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = docs.groupBy(_._2).flatMap { case (g, rows) =>
      var cum = 0L
      rows.sortBy { case (id, _, _) => (md5(id.toString), id) }
        .flatMap { case (id, _, text) =>
          cum += text.split(" ").length
          if (cum <= alloc(g)) Some(id) else None // cum only grows: done
        }
    }.toSet
    assert(kept === expect)
    assert(kept.nonEmpty && kept.size < docs.size)
  }

  test("property: temperature allocation is exact sqrt-proportional and exhausts the budget") {
    val caseGen: Gen[(Seq[Long], Long)] = for {
      k <- Gen.choose(1, 12)
      ns <- Gen.listOfN(k, Gen.choose(1L, 100000L))
      b <- Gen.choose(0L, 200000L)
    } yield (ns, b)
    sample(caseGen, 60).zipWithIndex.foreach { case ((ns, b), ci) =>
      val df = ns.zipWithIndex.map { case (n, i) => (f"g$i%02d", n) }
        .toDF("grp", "ntok")
      val got = Mixture.temperatureAllocation(df, "grp", col("ntok"), _ => b)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .sortBy(_._1)
      def isqrt(n: Long): Long =
        (0L to math.sqrt(n.toDouble).toLong + 2).takeWhile(y => y * y <= n).last
      val ss = ns.map(isqrt).sum
      // per-group: w_sqrt is the exact floor sqrt and alloc is within one
      // remainder token of exact proportionality
      got.zip(ns.zipWithIndex.sortBy { case (_, i) => f"g$i%02d" }).foreach {
        case ((g, n, s, sm, alloc), (n0, _)) =>
          assert(n === n0 && s === isqrt(n0), s"case $ci group $g")
          assert(sm === 1000000L * s / ss)
          val fl = (BigInt(b) * s / ss).toLong
          assert(alloc === fl || alloc === fl + 1L, s"case $ci group $g")
      }
      // the allocation exactly exhausts the budget
      assert(got.map(_._5).sum === b, s"case $ci total")
    }
  }

  test("temperatureSelect keeps every row of an over-allocated tail group") {
    // tail group has few tokens: sqrt weighting over-allocates it relative
    // to its size, so selection must cap at the group's own tokens
    val docs = (1L to 40L).map { i =>
      val grp = if (i <= 36) "head" else "tail"
      (i, grp, Seq.fill(if (grp == "head") 9 else 1)("w").mkString(" "))
    }
    val df = docs.toDF("doc_id", "grp", "text")
    val kept = Mixture.temperatureSelect(df, "grp",
        graft.llm.TextOps.tokenCount(col("text")), t => 3 * t / 4, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val tailIds = docs.filter(_._2 == "tail").map(_._1).toSet
    assert(tailIds.subsetOf(kept), "tail group must survive whole")
    assert((kept -- tailIds).size < 36, "head group must be downsampled")
  }

  test("packing/tokenizer id-column guards reject colliding names") {
    val df = Seq((1L, "a b")).toDF("word", "text")
    val cases: Seq[(String, () => Any)] = Seq(
      "shardBalanced" -> (() => graft.llm.Packing.shardBalanced(
        Seq((1L, "t")).toDF("shard", "text"), "shard", lit(1L), 2)),
      "lengthBucketBatches" -> (() => graft.llm.Packing.lengthBucketBatches(
        Seq((1L, "t")).toDF("bucket", "text"), "bucket", lit(1L), 2)),
      "unigramEncodeCounts" -> (() => Tokenizer.unigramEncodeCounts(
        df, "word", "text",
        Seq(("a", -1L)).toDF("piece", "lp_micro"))),
      "applyMergesTokenCounts" -> (() => Tokenizer.applyMergesTokenCounts(
        df, "word", "text", Seq("a" -> "b"))),
      "applyMergesTokenCountsKernel" -> (() =>
        Tokenizer.applyMergesTokenCountsKernel(df, "word", "text",
          Seq("a" -> "b"))))
    cases.foreach { case (name, f) =>
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("collides"), s"$name guard missing")
    }
  }

  // ----------------------------------------------------------- unigram

  test("unigramPieces: substring counts, prune keeps singles, scores are staged logs") {
    // corpus: "ab ab b" → words {ab:2, b:1}
    val df = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val got = Tokenizer.unigramPieces(df, "text", vocabSize = 2,
        maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // substrings: ab→{a,b,ab}×2, b→{b}: a=2, b=3, ab=2.
    // top-2 by (cnt desc, piece asc) = {b:3, a:2}; singles add nothing new
    // except... a and b are singles; ab(2) loses to a(2) on the tie (piece
    // asc). kept = {a:2, b:3}, total 5.
    def lp(c: Long) = graft.functions.PortableMath.microLnRef(c, 5L)
    assert(got.toSeq === Seq(("a", 2L, lp(2)), ("b", 3L, lp(3))))
  }

  test("unigramEncodeCounts: Viterbi prefers high-probability pieces, ties prefer fewer") {
    // pieces: ab has much higher probability than a·b separately
    val pieces = Seq(("a", -3000000L), ("b", -3000000L), ("ab", -1000000L))
      .toDF("piece", "lp_micro")
    val docs = Seq((1L, "abab ab a zz9!")).toDF("doc_id", "text")
    val got = Tokenizer.unigramEncodeCounts(docs, "doc_id", "text", pieces,
        maxPieceLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // abab → [ab, ab] (2 pieces, nll 2e6); ab → [ab] (1, 1e6);
    // a → [a] (1, 3e6); zz9! → non-alphanumeric → untrained (1, 0)
    assert(got.toSeq === Seq((1L, 4L, 5L, 6000000L)))

    // tie case: lp(ab) = lp(a) + lp(b) exactly → fewer pieces must win
    val tie = Seq(("a", -1000000L), ("b", -1000000L), ("ab", -2000000L))
      .toDF("piece", "lp_micro")
    val got2 = Tokenizer.unigramEncodeCounts(
        Seq((1L, "ab")).toDF("doc_id", "text"), "doc_id", "text", tie,
        maxPieceLen = 2)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(got2.toSeq === Seq((1L, 2000000L))) // one piece, same nll
  }

  test("wordpieceVocab: hand-computed top/prefix/continuation piece sets") {
    // corpus: aa ×2, ab ×1, "b!" non-alnum (excluded). vocabSize=1 →
    // top {aa}; prefixes ≥2: a(3), aa(2); conts ≥2: ##a(2). ab/##b at 1
    // fall below minCount.
    val docs = Seq((1L, "aa ab aa b!")).toDF("doc_id", "text")
    val got = Tokenizer.wordpieceVocab(docs, "text", vocabSize = 1,
      subLen = 3, minCount = 2L).as[String].collect().toSet
    assert(got === Set("aa", "a", "##a"))
  }

  test("wordpieceEncodeCounts: greedy longest match, whole-word UNK fallback") {
    val vocab = Seq("batch", "ba", "b", "##tch", "##es", "##s", "##t",
      "##ch").toDF("piece")
    val docs = Seq(
      (1L, "batches bat"),  // batch·##es (2) + ba·##t (2)
      (2L, "zzz batch !!")  // UNK (1) + batch (1) + non-alnum (1 unk)
    ).toDF("doc_id", "text")
    val rows = Tokenizer.wordpieceEncodeCounts(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(rows(1L) === ((2L, 4L, 0L)))
    assert(rows(2L) === ((3L, 3L, 2L)))
  }

  test("property: Viterbi encode equals brute-force enumeration over all segmentations") {
    val rnd = new scala.util.Random(41)
    val alphabet = "abc"
    // random piece table over a tiny alphabet: every single char (coverage)
    // plus random multi-char pieces, random negative micro scores —
    // includes score ties by construction (small score grid)
    val singles = alphabet.map(c => c.toString -> -(1 + rnd.nextInt(4)) * 500000L)
    val multis = (1 to 8).map { _ =>
      val len = 2 + rnd.nextInt(3)
      Seq.fill(len)(alphabet(rnd.nextInt(3))).mkString ->
        -(1 + rnd.nextInt(6)) * 500000L
    }.distinct
    val table = (singles ++ multis).toMap
    val pieces = table.toSeq.toDF("piece", "lp_micro")
    val words = (1 to 25).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(7))(alphabet(rnd.nextInt(3))).mkString))
    val docs = words.toDF("doc_id", "text")
    val got = Tokenizer.unigramEncodeCounts(docs, "doc_id", "text", pieces,
        maxPieceLen = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap

    // brute force: enumerate EVERY segmentation, pick max score then min
    // piece count (the documented tie rule)
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(4, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (table.contains(p)) segs(w.substring(l)).map(p +: _) else Nil
      }
    words.foreach { case (id, w) =>
      val all = segs(w)
      assert(all.nonEmpty, s"'$w' must be segmentable (singles covered)")
      val best = all.map(s => (s.map(table).sum, s.length))
        .maxBy { case (score, np) => (score, -np) }
      assert(got(id) === ((best._2.toLong, -best._1)),
        s"word '$w': got ${got(id)}, brute $best")
    }
  }

  test("unigram loop: encoding the corpus against its own pieces is total and exact") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val pieces = Tokenizer.unigramPieces(docs, "text", UnigramTestV, 4)
    val enc = Tokenizer.unigramEncodeCounts(docs, "doc_id", "text", pieces, 4)
    // self-trained: every alphanumeric word is segmentable (singles kept),
    // so n_pieces ≥ n_words and nll > 0 for every non-empty doc
    assert(enc.filter(col("n_pieces") < col("n_words")).count() === 0)
    assert(enc.filter(col("n_words") > 0 && col("nll_micro") <= 0)
      .count() === 0)
    // layout independence
    val enc2 = Tokenizer.unigramEncodeCounts(docs.repartition(13),
      "doc_id", "text", pieces, 4)
    assert(enc.exceptAll(enc2).count() === 0)
    assert(enc2.exceptAll(enc).count() === 0)
  }

  private val UnigramTestV = 64

  // --------------------------------------------------------------- bpe

  test("bpeMerges learns greedy left-to-right merges (adjacent pairs available, overlaps not)") {
    // 'abab' x3: pair (a,b) wins with count 6 (both positions per word
    // occurrence); after merging, (ab,ab) is countable — adjacency across
    // a merge result must be visible. 'aaa' x2 exercises overlap: (a,a)
    // counts 4 raw but only the FIRST of the two overlapping occurrences
    // may merge per word.
    val df = Seq.fill(3)("abab").union(Seq.fill(2)("aaa")).toDF("text")
    val got = Tokenizer.bpeMerges(df, "text", 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: pairs ab:6 (3×2), aa:4 (2×2), ba:3 → (a,b) — the 'ba' pair
    //          proves pre-merge adjacency counting
    // round 2: words 'ab ab' ×3, 'aaa' ×2 → (ab,ab):3 vs (a,a):4 → (a,a):
    //          raw adjacent count (both overlapping occurrences) decides
    //          the WINNER even though only the first occurrence merges
    // round 3: words 'abab' ×3, 'aa a' ×2 → (ab,ab):3 beats (aa,a):2 —
    //          adjacency across a prior merge result is visible
    assert(got.toSeq === Seq(
      (1L, "a", "b", 6L),
      (2L, "a", "a", 4L),
      (3L, "ab", "ab", 3L)))
  }

  test("applyMergesTokenCounts encodes with the learned merges; unknown words count 1") {
    val train = Seq.fill(3)("abab").union(Seq.fill(2)("aaa")).toDF("text")
    val merges = Tokenizer.bpeMerges(train, "text", 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // merges: (a,b) → (a,a) → (ab,ab); so 'abab'→[abab]=1, 'aaa'→[aa,a]=2,
    // 'ab'→[ab]=1, 'ba'→[b,a]=2, '!!' non-alnum → 1
    val docs = Seq((1L, "abab aaa"), (2L, "ab ba !!"), (3L, "zzz"))
      .toDF("doc_id", "text")
    val got = Tokenizer.applyMergesTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq === Seq((1L, 2L, 3L), (2L, 3L, 4L), (3L, 1L, 3L)))
  }

  test("property: kernel encoder is bit-equal to the chained-replace fold") {
    // Random dense corpora over a 2-letter alphabet force heavy merge
    // interaction (adjacent/overlapping occurrences, multi-round growth);
    // mined tables then exercise the real loop. Both paths must agree
    // exactly — the kernel replaces the fold at scale, so any divergence
    // is a correctness bug, not an approximation.
    val wordGen = for {
      n <- Gen.choose(1, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val docGen = for {
      k <- Gen.choose(1, 6)
      ws <- Gen.listOfN(k, wordGen)
    } yield ws.mkString(" ")
    (0 until 6).foreach { ci =>
      val texts = sample(docGen, 8).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = texts.toDF("doc_id", "text")
      val merges = Tokenizer.bpeMerges(df, "text", 5)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      if (merges.nonEmpty) {
        val fold = Tokenizer.applyMergesTokenCounts(df, "doc_id", "text", merges)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
        val kern = Tokenizer.applyMergesTokenCountsKernel(df, "doc_id", "text", merges)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
        assert(kern.toSeq === fold.toSeq, s"case $ci diverged: texts=$texts merges=$merges")
      }
    }
    // adversarial ILL-FORMED table: merge 1 references a symbol only merge 2
    // creates ("resurrection"). Sequential semantics must NOT apply it —
    // both paths agree on 'xab' staying 2 pieces, not fusing to 'xab'.
    val ill = Seq(("x", "ab"), ("a", "b"))
    val df2 = Seq((1L, "xab")).toDF("doc_id", "text")
    val f2 = Tokenizer.applyMergesTokenCounts(df2, "doc_id", "text", ill).collect()
    val k2 = Tokenizer.applyMergesTokenCountsKernel(df2, "doc_id", "text", ill).collect()
    assert(f2.map(_.getLong(2)).toSeq === Seq(2L))
    assert(k2.map(_.getLong(2)).toSeq === Seq(2L))
  }

  test("kernel encoder handles a 2048-merge table, matching an independent sequential reference") {
    // depth the chained-replace fold cannot plan; the reference below is a
    // deliberately naive pass-per-merge loop (no adjacency skip), so the
    // kernel's optimization is checked against independent logic
    val merges = graft.tools.ScaleProbe.syntheticMerges(2048)
    def refEncode(word: String): Long = {
      var syms = word.map(_.toString).toVector
      for ((l, r) <- merges if syms.length > 1) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length.toLong
    }
    val words = Seq("w1", "w123", "w4242", "w999w999", "w0w1w2w3w4",
      "1234567890", "ww", "w")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = Tokenizer.applyMergesTokenCountsKernel(docs, "doc_id", "text",
        merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) === refEncode(w), s"word '$w' diverged")
    }
  }

  test("bpeMerges stops early when the vocabulary runs out of pairs") {
    val df = Seq("ab", "cd").toDF("text")
    val got = Tokenizer.bpeMerges(df, "text", 10).collect()
    assert(got.length === 2) // (a,b) then (c,d); fully merged words end it
  }

  // --------------------------------------------------------------- rrf

  test("rrfFuse combines rank lists with exact integer reciprocal ranks") {
    val a = Seq(("q1", 10L, 1L), ("q1", 20L, 2L), ("q1", 30L, 3L))
      .toDF("query_id", "item_id", "rank")
    val b = Seq(("q1", 20L, 1L), ("q1", 40L, 2L))
      .toDF("query_id", "item_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._5)
    def c(r: Long) = 1000000L / (60 + r)
    // 20 appears in both lists: 1/(60+2) + 1/(60+1) — must win
    val expect = Seq(
      ("q1", 20L, 2L, c(2) + c(1), 1L),
      ("q1", 10L, 1L, c(1), 2L),
      ("q1", 40L, 1L, c(2), 3L),
      ("q1", 30L, 1L, c(3), 4L))
    assert(got.toSeq === expect)
  }

  // ------------------------------------------------------- collocations

  test("collocations: PMI is the two-factor staged log and ranking is total-ordered") {
    // 'x y' always adjacent (high PMI), 'a'/'b' frequent but independent
    val docs = (Seq.fill(6)("x y") ++ Seq.fill(10)("a b a b a b")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val got = CorpusStats.collocations(df, "text", minCount = 3L, k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

    // independent reference over plain collections
    val toks = docs.map(_._2.split("\\s+").toSeq)
    val bigrams = toks.flatMap(s => s.zip(s.tail))
    val c2 = bigrams.groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    val c1 = toks.flatten.groupBy(identity).map { case (k1, v) => k1 -> v.size.toLong }
    val bb = bigrams.size.toLong
    val tt = toks.flatten.size.toLong
    val expect = c2.toSeq.filter(_._2 >= 3)
      .map { case ((w1, w2), n2) =>
        val pmi = PortableMath.microLnSignedRef(n2 * tt, bb * c1(w1)) +
          PortableMath.microLnSignedRef(tt, c1(w2))
        (w1, w2, n2, pmi)
      }
      .sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }
      .take(5).zipWithIndex
      .map { case ((w1, w2, n2, pmi), i) => (w1, w2, n2, pmi, i + 1L) }
    assert(got.toSeq === expect)
    // the genuinely-collocated pair outranks the independent ones
    assert(got.head._1 === "x" && got.head._2 === "y")
  }

  // ------------------------------------------------------------ winnow

  test("winnowFingerprints: local-match guarantee and ~2/(w+1) density") {
    import graft.llm.TextOps
    val k = 5
    val w = 4
    // two docs sharing a run of w+k-1 = 8 tokens amid distinct noise
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 $shared a5 a6 a7 a8"),
      (2L, s"b1 b2 b3 b4 b5 $shared b6 b7 b8"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("doc_id", "text")
    val fp = TextOps.winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // guarantee: the shared 8-token run yields at least one shared hash
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    // the unrelated doc shares nothing with either
    assert((byDoc(3L) & byDoc(1L)).isEmpty && (byDoc(3L) & byDoc(2L)).isEmpty)
    // determinism across runs
    val fp2 = TextOps.winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fp.sorted.toSeq === fp2.sorted.toSeq)

    // density on a long pseudo-random doc: expected 2/(w+1) = 0.4 of the
    // shingle count, loosely bounded
    val long = Seq((9L, (1 to 2000).map(i =>
      s"t${(i * 2654435761L) % 9973}").mkString(" "))).toDF("doc_id", "text")
    val nsh = 2000 - k + 1
    val nfp = TextOps.winnowFingerprints(long, "doc_id", "text", k, w).count()
    val density = nfp.toDouble / nsh
    assert(density > 0.25 && density < 0.55, s"density $density")
  }

  test("winnowFingerprints kernel matches the retired Column chain bit-for-bit") {
    import graft.llm.TextOps
    // the r17 mapPartitions kernel replaced the explode + md5-projection +
    // per-doc-window Column chain (a corpus-wide exchange + sort for
    // doc-local work); this pins the equality against the VERBATIM old
    // chain — real corpus text plus the edge shapes the semantics notes
    // call out (Spark trim is space-only; split keeps a leading empty
    // token after a tab; short docs; empty and NULL text)
    def columnForm(df: org.apache.spark.sql.DataFrame, idCol: String,
        textCol: String, k: Int, w: Int): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val base = df.select(col(idCol), TextOps.tokens(col(textCol)).as("__wtk"))
      val sh = base
        .select(col(idCol), explode(sequence(lit(1),
          greatest(size(col("__wtk")) - (k - 1), lit(1)))).as("__wpos"),
          col("__wtk"))
        .select(col(idCol), col("__wpos"),
          conv(substring(md5(array_join(
            slice(col("__wtk"), col("__wpos"), lit(k)), " ")), 1, 10), 16, 10)
            .cast("long").as("__whash"))
      val comb = col("__whash") * (1L << 20) + col("__wpos")
      val frame = Window.partitionBy(col(idCol)).orderBy(col("__wpos"))
        .rowsBetween(-(w - 1), 0)
      sh.withColumn("__wmin", min(comb).over(frame))
        .select(col(idCol), col("__wmin")).distinct()
        .select(col(idCol),
          (col("__wmin") % (1L << 20)).as("pos"),
          expr(s"__wmin div ${1L << 20}").as("fingerprint"))
    }
    val real = Tables(spark, sf0001).documents.select(col("doc_id"), col("text"))
    val edge = Seq[(java.lang.Long, String)](
      (100001L, ""), (100002L, "   "), (100003L, "one"),
      (100004L, "\tleading tab and  runs\n of ws"),
      (100005L, "a b c d e"), (100006L, null))
      .toDF("doc_id", "text")
    for (df <- Seq(real, edge); (k, w) <- Seq((5, 4), (3, 7), (1, 1))) {
      val kern = TextOps.winnowFingerprints(df, "doc_id", "text", k, w)
      val cols = columnForm(df, "doc_id", "text", k, w)
      assert(kern.exceptAll(cols).isEmpty && cols.exceptAll(kern).isEmpty,
        s"kernel/Column divergence at k=$k w=$w")
    }
    // and the kernel plan is shuffle-free (the point of the swap)
    val plan = TextOps.winnowFingerprints(real, "doc_id", "text", 5, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("winnowNearDupPairs finds every planted truncation pair with exact shared counts") {
    import graft.llm.Dedup
    val base = Tables(spark, sf0001).documents
      .select(col("doc_id"), col("text")).limit(100)
    val toks = split(trim(col("text")), "\\s+")
    val planted = base.unionByName(base.select(
      (col("doc_id") + 100000).as("doc_id"),
      array_join(slice(toks, lit(1),
        floor(size(toks) * 0.8).cast("int")), " ").as("text")))
    val pairs = Dedup.winnowNearDupPairs(planted, "doc_id", "text",
        k = 5, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    // every doc long enough for its truncation to carry a shared run
    // (≥ w+k-1 = 8 tokens surviving the 80% cut) must pair with its copy
    val longIds = base.filter(size(toks) >= 12).select("doc_id")
      .collect().map(_.getLong(0))
    assert(longIds.nonEmpty)
    longIds.foreach { id =>
      assert(asMap.contains((id, id + 100000)),
        s"planted pair for doc $id missing")
    }
    assert(pairs.forall(_._3 >= 2))
  }

  test("dropWinnowDuplicates keeps exactly the min-id survivor of each truncation family") {
    import graft.llm.Dedup
    // three 30-token docs with disjoint vocabularies, each with a 24-token
    // truncated copy at id+100: every family shares a run far above the
    // w+k-1 = 8 guarantee, so the pairs are certain, not probabilistic
    val docs = (1L to 3L).map { i =>
      (i, (1 to 30).map(j => s"d${i}w$j").mkString(" "))
    }
    val planted = docs ++ docs.map { case (i, txt) =>
      (i + 100, txt.split(" ").take(24).mkString(" "))
    }
    val df = planted.toDF("doc_id", "text")
    val kept = Dedup.dropWinnowDuplicates(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 3L))
    // keep-best by token count keeps the LONG member even when it has the
    // larger id: invert the planting so copies get the small ids
    val inverted = docs.map { case (i, txt) => (i + 100, txt) } ++
      docs.map { case (i, txt) => (i, txt.split(" ").take(24).mkString(" ")) }
    val keptBest = Dedup.dropWinnowDuplicatesKeepBest(
        inverted.toDF("doc_id", "text"), "doc_id", "text",
        size(split(trim(col("text")), "\\s+")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptBest === Set(101L, 102L, 103L))
  }

  test("mmrSelect picks diverse items over redundant higher-relevance ones") {
    import graft.llm.Selection
    // a (rel 1000), near-copy of a (rel 990), orthogonal b (rel 500):
    // greedy MMR must pick a, then b (the near-copy's redundancy penalty
    // ~10⁶ dwarfs its 490-point relevance edge), then the near-copy
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), 1000L),
      (2L, Seq(0.99f, 0.01f, 0.0f), 990L),
      (3L, Seq(0.0f, 1.0f, 0.0f), 500L))
      .toDF("vec_id", "embedding", "rel")
    val got = Selection.mmrSelect(vecs, "vec_id", col("rel"), "embedding", 3)
      .orderBy("sel_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 1L), (3L, 2L), (2L, 3L)))
    // k larger than the corpus stops early with every item ranked
    val all = Selection.mmrSelect(vecs, "vec_id", col("rel"), "embedding", 10)
    assert(all.count() === 3)
    // scores: rank-1 carries raw relevance; rank-3 carries rel − maxsim
    val scores = Selection.mmrSelect(vecs, "vec_id", col("rel"), "embedding", 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(scores(1L) === 1000L)
    assert(scores(3L) < 0L) // near-copy's penalty pushed it far negative
  }

  test("mmrSelect buffered argmax: any bufferM yields the same trajectory") {
    import graft.llm.Selection
    // an adversarial set: clusters of near-copies so buffer scores
    // REORDER after each pick (the redundancy penalty knocks out the
    // rest of the picked item's cluster), plus negative-similarity
    // vectors — exercising local updates, bound rejections and refills
    val rng = Seq( // (id, vec, rel) — three clusters + two anti-vectors
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1000L),
      (2L, Seq(0.99f, 0.02f, 0.0f, 0.0f), 995L),
      (3L, Seq(0.98f, 0.03f, 0.0f, 0.0f), 990L),
      (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 900L),
      (5L, Seq(0.01f, 0.99f, 0.0f, 0.0f), 895L),
      (6L, Seq(0.0f, 0.0f, 1.0f, 0.0f), 800L),
      (7L, Seq(0.0f, 0.02f, 0.99f, 0.0f), 790L),
      (8L, Seq(-1.0f, 0.0f, 0.0f, 0.0f), 100L),
      (9L, Seq(0.0f, -1.0f, 0.0f, 0.0f), 90L),
      (10L, Seq(0.0f, 0.0f, 0.0f, 1.0f), 50L))
      .toDF("vec_id", "embedding", "rel")
    val wide = Selection
      .mmrSelect(rng, "vec_id", col("rel"), "embedding", 8, bufferM = 1000)
      .orderBy("sel_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    for (m <- Seq(1, 2, 3)) {
      val tight = Selection
        .mmrSelect(rng, "vec_id", col("rel"), "embedding", 8, bufferM = m)
        .orderBy("sel_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(tight === wide, s"bufferM=$m diverged from the full pass")
    }
    // sanity: rank 1 is the raw-relevance winner; rank 2 is the
    // anti-vector (negative similarity is a diversity REWARD under the
    // unclamped objective: 100 − (−10⁶) beats every cluster head)
    assert(wide.head._1 === 1L)
    assert(wide(1)._1 === 8L)
    assert(wide.map(_._1).distinct.size === wide.size)
  }

  test("mmrSelect job count is buffered, not one job per pick") {
    import graft.llm.Selection
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    // wall-independent pin of the r13 buffering claim: k picks must NOT
    // cost k Spark jobs. Relevance gaps (10⁷ per rank) dominate the
    // cosine penalty range (≤ 2·10⁶), so buffer scores never reorder
    // across the bound and ONE refill serves picks 2..k locally — the
    // whole run is the eager localCheckpoint + pick-1 pass + one refill,
    // a handful of jobs independent of k. (Clustered data where picks
    // suppress whole duplicate classes legitimately refills more often —
    // the trajectory-equality test above covers that regime.)
    val n = 200
    val vecs = (1 to n).map { i =>
      val a = (i % 17).toFloat / 17f
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat,
        (i % 5).toFloat / 5f), (2000L - i) * 10000000L)
    }.toDF("vec_id", "embedding", "rel")
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    val k = 24
    spark.sparkContext.addSparkListener(listener)
    val got =
      try {
        val r = Selection.mmrSelect(vecs, "vec_id", col("rel"),
          "embedding", k).collect()
        // drain the async listener bus: poll until the job counter is
        // stable across two consecutive checks (bounded), instead of a
        // fixed sleep that races a slow bus
        var last = -1; var stableMs = 0; var totalMs = 0
        while (stableMs < 300 && totalMs < 5000) {
          Thread.sleep(100); totalMs += 100
          if (counter.get() == last) stableMs += 100
          else { last = counter.get(); stableMs = 0 }
        }
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(got.length === k)
    // sequential form = k+1 jobs minimum (checkpoint + one per pick); the
    // buffered form must stay well below that. The bound is k-RELATIVE
    // (not an absolute handful) so AQE materializing an extra job per
    // exchange stage on an engine upgrade cannot flake the spec while a
    // broken buffer (≥ k jobs) still trips it.
    assert(counter.get() < k / 2,
      s"mmrSelect($k picks) ran ${counter.get()} jobs — buffering broke")
  }

  // --------------------------------------------------------- blocklist

  test("blocklistCounts: token-exact phrase instances, zero rows kept") {
    import graft.llm.TextOps
    val docs = Seq(
      (1L, "slow merge slow merge dup"), // 2× 'slow merge' + 1× 'dup'
      (2L, "big hash big hash"),         // adjacent 2-token occurrences
      (3L, "merge slow hash big"),       // reversed orders must NOT match
      (4L, "dupdup bigdup"))             // substrings must NOT match
      .toDF("doc_id", "text")
    val got = TextOps.blocklistCounts(docs, "doc_id", "text",
        Seq("slow merge", "big hash", "dup"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 3L, 2L, true),
      (2L, 2L, 1L, true),
      (3L, 0L, 0L, false),
      (4L, 0L, 0L, false)))
  }

  // ----------------------------------------------------------- entropy

  test("tokenEntropy: exact fixed-point Shannon entropy of the token distribution") {
    import graft.llm.TextOps
    val docs = Seq(
      (1L, "a a a a"),       // degenerate: H = 0
      (2L, "a b c d"),       // uniform singletons: H = ln 4
      (3L, "a a b b"),       // H = ln 2
      (4L, "x"))             // single token: H = 0
      .toDF("doc_id", "text")
    val got = TextOps.tokenEntropy(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    def lp(x: Long) = graft.functions.PortableMath.microLnSignedRef(x, 1L)
    assert(got.toSeq === Seq(
      (1L, 4L, 1L, 0L),
      (2L, 4L, 4L, lp(4)),          // ln 4 ≈ 1.386294e6 micro-nats
      (3L, 4L, 2L, lp(4) - lp(2)),  // = ln 2 exactly in the fixed point
      (4L, 1L, 1L, 0L)))
    assert(lp(4) === 1386294L)
  }

  // ------------------------------------------------------------ kmeans

  test("kmeansInt8: assignment is the true argmin centroid and runs are deterministic") {
    val emb = Tables(spark, sf0001).embeddings
    val r1 = Similarity.kmeansInt8(emb, k = 8, iters = 2)
    val rows1 = r1.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rows2 = Similarity.kmeansInt8(emb, k = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows1.sorted.toSeq === rows2.sorted.toSeq, "nondeterministic run")
    assert(rows1.map(_._1).distinct.length === rows1.length, "dup vec_id")
    assert(rows1.forall { case (_, c, d) => c >= 0 && c < 8 && d >= 0 })
    // more than one cluster used on real data
    assert(rows1.map(_._2).distinct.length > 1)
  }

  // planted bitext geometry shared by the all-pairs model test and the
  // candidate-fed equality tests: 0↔101 and 2↔103 are true pairs; 105 is
  // a HUB (moderate similarity to every source vector) that is 4's COSINE
  // argmax, but the ratio margin must prefer the non-hub 109 (lower
  // cosine, much lower neighborhood mean); 6 and 8 both best-match 107
  // but 107's best is 6 — (8, 107) must lose mutual-best even at a
  // passing margin
  private def bv(x: Double*): Seq[Double] = x ++ Seq.fill(8 - x.size)(0.0)
  private lazy val bitextSrc = Seq(
    (0L, bv(1.0, 0.05)),
    (2L, bv(0.05, 1.0)),
    (4L, bv(0.0, 0.0, 1.0)),
    (6L, bv(0.0, 0.0, 0.0, 1.0)),
    (8L, bv(0.0, 0.0, 0.0, 0.9, 0.3)))
  private lazy val bitextTgt = Seq(
    (101L, bv(1.0, 0.0)),
    (103L, bv(0.0, 1.0)),
    (105L, bv(0.45, 0.45, 0.75, 0.45, 0.1)),
    (107L, bv(0.0, 0.0, 0.05, 1.0)),
    (109L, bv(0.0, 0.0, 0.6, 0.0, 0.0, 0.8)))
  private val BitextFixtureK = 2
  private val BitextFixtureThr = 1020000L

  test("bitextMine: mutual-best ratio-margin pairs, hub suppression, " +
      "threshold — engine equals an independent driver model") {
    import graft.llm.Retrieval
    val src = bitextSrc
    val tgt = bitextTgt
    val k = BitextFixtureK
    val thr = BitextFixtureThr
    val got = Retrieval.bitextMine(
        src.toDF("id", "v"), tgt.toDF("id", "v"), "id", "v",
        k = k, marginThresholdMicro = thr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // independent driver model of the documented semantics
    def qz(x: Seq[Double]): Seq[Long] = {
      val amax = x.map(math.abs).max
      if (amax == 0) x.map(_ => 0L)
      else x.map(e => math.floor(e * 127 / amax + 0.5).toLong)
    }
    def simMicro(a: Seq[Long], b: Seq[Long]): Long = {
      val dot = a.zip(b).map { case (p, q) => p * q }.sum
      val na = a.map(p => p * p).sum; val nb = b.map(q => q * q).sum
      if (na == 0 || nb == 0) -2000000L
      else math.floor(dot.toDouble / math.sqrt((na * nb).toDouble)
        * 1000000.0).toLong
    }
    val qs = src.map { case (i, x) => i -> qz(x) }
    val qt = tgt.map { case (i, x) => i -> qz(x) }
    val sims = (for ((si, sq) <- qs; (ti, tq) <- qt)
      yield (si, ti) -> simMicro(sq, tq)).toMap
    def topkSum(rows: Seq[(Long, Long)]): (Long, Long) = {
      val top = rows.sortBy { case (oid, s) => (-s, oid) }.take(k)
      (top.map(_._2).sum, top.size.toLong)
    }
    val sSum = qs.map { case (si, _) =>
      si -> topkSum(qt.map { case (ti, _) => (ti, sims((si, ti))) }) }.toMap
    val tSum = qt.map { case (ti, _) =>
      ti -> topkSum(qs.map { case (si, _) => (si, sims((si, ti))) }) }.toMap
    val margins: Map[(Long, Long), Long] = sims.toSeq.flatMap {
      case ((si, ti), s) =>
        val den = sSum(si)._1 * tSum(ti)._2 + tSum(ti)._1 * sSum(si)._2
        if (s > 0 && den > 0)
          Some((si, ti) ->
            (2L * s * sSum(si)._2 * tSum(ti)._2 * 1000000L) / den)
        else None
    }.toMap
    val fwd = margins.keys.map(_._1).map { si =>
      margins.toSeq.filter(_._1._1 == si)
        .minBy { case ((_, ti), m) => (-m, ti) }._1
    }.toSet
    val bwd = margins.keys.map(_._2).map { ti =>
      margins.toSeq.filter(_._1._2 == ti)
        .minBy { case ((s2, _), m) => (-m, s2) }._1
    }.toSet
    val model = (fwd intersect bwd).filter(margins(_) >= thr)
      .map(p => (p._1, p._2, sims(p), margins(p)))
    assert(got === model)
    // the fixture genuinely exercises each claimed path:
    val mined = got.map(p => (p._1, p._2))
    assert(mined.contains((0L, 101L)) && mined.contains((2L, 103L)))
    // hub suppression: 4's COSINE argmax is the hub 105, but the ratio
    // margin prefers the non-hub 109 (the hub's high neighborhood mean
    // dilutes its margin) — the property the margin exists to provide
    val cosBest4 = sims.collect { case ((4L, ti), s) => (ti, s) }
      .toSeq.sortBy { case (ti, s) => (-s, ti) }.head._1
    assert(cosBest4 === 105L, s"fixture drift: hub not 4's cosine best")
    assert(margins((4L, 109L)) > margins((4L, 105L)),
      "fixture drift: margin did not out-rank the hub")
    assert(mined.contains((4L, 109L)) && !mined.exists(_._2 == 105L))
    // mutual-best: (8, 107) clears the threshold but 107 prefers 6
    assert(margins((8L, 107L)) >= thr && fwd.contains((8L, 107L)) &&
      !bwd.contains((8L, 107L)),
      "fixture drift: mutual-best case inert")
    assert(mined.contains((6L, 107L)) && !mined.exists(_._1 == 8L))
  }

  test("property: bitextMine equals the driver model on GENERATED " +
      "geometries — zero-norm vectors, cross-side duplicates, random " +
      "k and thresholds (12 seeded cases)") {
    import graft.llm.Retrieval
    // the fixed planted fixture above pins the named behaviors (hub
    // suppression, mutual-best kill); this sweep pins the tie and
    // sentinel LANDSCAPE — duplicate vectors make micro-sim ties
    // likely, zero-norm rows inject the −2·10⁶ sentinel into the k-NN
    // sums, and random k exercises neighborhoods smaller than k
    def model(src: Seq[(Long, Seq[Double])], tgt: Seq[(Long, Seq[Double])],
        k: Int, thr: Long): Set[(Long, Long, Long, Long)] = {
      def qz(x: Seq[Double]): Seq[Long] = {
        val amax = x.map(math.abs).max
        if (amax == 0) x.map(_ => 0L)
        else x.map(e => math.floor(e * 127 / amax + 0.5).toLong)
      }
      def simMicro(a: Seq[Long], b: Seq[Long]): Long = {
        val dot = a.zip(b).map { case (p, q) => p * q }.sum
        val na = a.map(p => p * p).sum; val nb = b.map(q => q * q).sum
        if (na == 0 || nb == 0) -2000000L
        else math.floor(dot.toDouble / math.sqrt((na * nb).toDouble)
          * 1000000.0).toLong
      }
      val qs = src.map { case (i, x) => i -> qz(x) }
      val qt = tgt.map { case (i, x) => i -> qz(x) }
      val sims = (for ((si, sq) <- qs; (ti, tq) <- qt)
        yield (si, ti) -> simMicro(sq, tq)).toMap
      def topkSum(rows: Seq[(Long, Long)]): (Long, Long) = {
        val top = rows.sortBy { case (oid, s) => (-s, oid) }.take(k)
        (top.map(_._2).sum, top.size.toLong)
      }
      val sSum = qs.map { case (si, _) =>
        si -> topkSum(qt.map { case (ti, _) => (ti, sims((si, ti))) }) }.toMap
      val tSum = qt.map { case (ti, _) =>
        ti -> topkSum(qs.map { case (si, _) => (si, sims((si, ti))) }) }.toMap
      val margins: Map[(Long, Long), Long] = sims.toSeq.flatMap {
        case ((si, ti), s) =>
          val den = sSum(si)._1 * tSum(ti)._2 + tSum(ti)._1 * sSum(si)._2
          if (s > 0 && den > 0)
            Some((si, ti) ->
              (2L * s * sSum(si)._2 * tSum(ti)._2 * 1000000L) / den)
          else None
      }.toMap
      val fwd = margins.keys.map(_._1).map { si =>
        margins.toSeq.filter(_._1._1 == si)
          .minBy { case ((_, ti), m) => (-m, ti) }._1
      }.toSet
      val bwd = margins.keys.map(_._2).map { ti =>
        margins.toSeq.filter(_._1._2 == ti)
          .minBy { case ((s2, _), m) => (-m, s2) }._1
      }.toSet
      (fwd intersect bwd).filter(margins(_) >= thr)
        .map(p => (p._1, p._2, sims(p), margins(p)))
    }
    var nonEmpty = 0
    (1 to 12).foreach { c =>
      val rnd = new scala.util.Random(c * 31337)
      val dim = 4 + rnd.nextInt(3)
      def vec(): Seq[Double] =
        if (rnd.nextInt(8) == 0) Seq.fill(dim)(0.0)
        else Seq.fill(dim)(rnd.nextInt(11) - 5.0)
      val nS = 3 + rnd.nextInt(4); val nT = 3 + rnd.nextInt(4)
      val src = (0 until nS).map(i => (i * 2L, vec()))
      val tgt0 = (0 until nT).map(i => (i * 2L + 1, vec()))
      // cross-side duplicate: a tgt vector copies a src vector, making
      // an exact sim-1 pair and likely micro ties downstream
      val tgt = if (rnd.nextBoolean())
        tgt0.updated(0, (tgt0.head._1, src(rnd.nextInt(nS))._2))
      else tgt0
      val k = 1 + rnd.nextInt(3)
      val thr = 900000L + rnd.nextInt(300000)
      val got = Retrieval.bitextMine(src.toDF("id", "v"),
          tgt.toDF("id", "v"), "id", "v", k, thr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val exp = model(src, tgt, k, thr)
      assert(got === exp, s"case $c k=$k thr=$thr src=$src tgt=$tgt")
      if (exp.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 4, s"only $nonEmpty non-empty cases — the " +
      "generator stopped producing minable geometries")
  }

  test("bitextMineFromCandidates fed exact top-k lists equals the " +
      "all-pairs bitextMine on the planted geometry") {
    import graft.llm.{Retrieval, Similarity}
    import org.apache.spark.sql.expressions.Window
    val srcDf = bitextSrc.toDF("id", "v")
    val tgtDf = bitextTgt.toDF("id", "v")
    // exact top-k candidate lists by the mining's OWN ordering (micro
    // int8 cosine desc, neighbor id asc) — recall 1 by construction, so
    // the union's windowed top-k provably equals the global top-k and
    // the candidate-fed output must be identical to all-pairs
    def exactLists(q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) = {
      val qd = q.select(col("id").cast("long").as("query_id"),
        Similarity.quantizeInt8(col("v").cast("array<double>")).as("qa"))
      val cd = c.select(col("id").cast("long").as("neighbor_id"),
        Similarity.quantizeInt8(col("v").cast("array<double>")).as("qb"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      qd.crossJoin(cd)
        .withColumn("sim", Similarity.intCosineMicro(col("qa"), col("qb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= BitextFixtureK)
        .select(col("query_id"), col("neighbor_id"))
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val allPairs = rows(Retrieval.bitextMine(srcDf, tgtDf, "id", "v",
      k = BitextFixtureK, marginThresholdMicro = BitextFixtureThr))
    val fed = rows(Retrieval.bitextMineFromCandidates(srcDf, tgtDf,
      "id", "v", exactLists(srcDf, tgtDf), exactLists(tgtDf, srcDf),
      k = BitextFixtureK, marginThresholdMicro = BitextFixtureThr))
    assert(allPairs.nonEmpty && fed === allPairs)
  }

  test("bitextMineFromCandidates fed ivfTopK at nProbe = nCells " +
      "(structural recall 1) equals all-pairs, and its plan has no " +
      "cartesian or nested-loop join") {
    import graft.llm.{Retrieval, Similarity}
    val srcDf = bitextSrc.toDF("id", "v")
    val tgtDf = bitextTgt.toDF("id", "v")
    // probing EVERY cell makes the IVF candidate set the full cross
    // product before re-rank, so each side's top-k list is exact —
    // recall is structurally 1 regardless of how training clusters
    def lists(q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) =
      // boundedQueries = false: the corpus-mining contract this feed
      // exists for — the equality below also proves the unbounded-mode
      // plan (shuffled probe joins, no query-side broadcast) returns
      // identical rows
      Similarity.ivfTopK(q, c, k = BitextFixtureK, nCells = 3, nProbe = 3,
        idCol = "id", vecCol = "v", boundedQueries = false)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val fed = Retrieval.bitextMineFromCandidates(srcDf, tgtDf, "id", "v",
      lists(srcDf, tgtDf), lists(tgtDf, srcDf),
      k = BitextFixtureK, marginThresholdMicro = BitextFixtureThr)
    val allPairs = rows(Retrieval.bitextMine(srcDf, tgtDf, "id", "v",
      k = BitextFixtureK, marginThresholdMicro = BitextFixtureThr))
    assert(rows(fed) === allPairs)
    // the scale claim itself: the candidate-fed MINING plan is free of
    // cartesian products and nested-loop joins (the ivf candidate stage
    // broadcasts only bounded probe/centroid sides — asserted separately
    // in ScanAuditSpec on the full ret_bitext_ann plan)
    val minePlan = Retrieval.bitextMineFromCandidates(srcDf, tgtDf,
        "id", "v",
        lists(srcDf, tgtDf).select("query_id", "neighbor_id")
          .localCheckpoint(),
        lists(tgtDf, srcDf).select("query_id", "neighbor_id")
          .localCheckpoint(),
        k = BitextFixtureK, marginThresholdMicro = BitextFixtureThr)
      .queryExecution.executedPlan.toString
    assert(!minePlan.contains("CartesianProduct"), minePlan)
    assert(!minePlan.contains("BroadcastNestedLoopJoin"), minePlan)
  }

  test("candidate-fed mining at recall < 1: the degradation curve is " +
      "pinned — recovered planted pairs decay gently, spurious extras " +
      "appear via MARGIN INFLATION (mined is NOT a subset of all-pairs)") {
    import graft.llm.{Retrieval, Similarity}
    // r15 VERDICT ask #6 asked for "a monotone precision floor (mined ⊆
    // all-pairs mined at every recall — margins only shrink when
    // neighborhoods are missing)". MEASURED RESULT: that intuition is
    // FALSE, and the sweep pins the true behavior. When a probe misses
    // part of a vector's true top-k, the retrieved neighborhood's sims
    // are element-wise DOMINATED by the true top-k, so the k-NN sums
    // SHRINK — and the sums sit in the margin's DENOMINATOR, so missing
    // neighbors INFLATE margins (the vector's neighborhood looks sparser,
    // making any surviving pair look more exceptional). Inflated margins
    // push borderline distractor pairs over the threshold: mined ⊄
    // all-pairs below full recall. What DOES hold, pinned below:
    // recall-1 equality is exact, recovered PLANTED pairs decay gently
    // and monotonically, and the spurious extras are bounded and grow as
    // probes shrink. 40 planted src↔tgt pairs (tgt = src + one bumped
    // coordinate), 60 distractors per side, deterministic
    // integer-derived vectors — no RNG, so the curve is exact and any
    // drift is a semantics change.
    val dim = 8
    def baseVec(i: Int): Seq[Double] =
      (0 until dim).map(j => ((i * (j + 3)) % 101 - 50).toDouble)
    val planted = (1 to 40).map { i =>
      val v = baseVec(i)
      val w = v.zipWithIndex.map { case (x, j) =>
        if (j == i % dim) x + 3.0 else x }
      ((i.toLong, v), ((1000 + i).toLong, w))
    }
    def distractor(i: Int): Seq[Double] =
      (0 until dim).map(j => (((i + 500) * (j + 11)) % 89 - 44).toDouble)
    val srcDf = (planted.map(_._1) ++ (101 to 160)
      .map(i => (i.toLong, distractor(i)))).toDF("id", "v").localCheckpoint()
    val tgtDf = (planted.map(_._2) ++ (1201 to 1260)
      .map(i => (i.toLong, distractor(i + 300)))).toDF("id", "v")
      .localCheckpoint()
    val k = 4; val thr = 1020000L
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val allPairs = rows(Retrieval.bitextMine(srcDf, tgtDf, "id", "v",
      k, thr))
    val truePairs = (1 to 40).map(i => (i.toLong, (1000 + i).toLong)).toSet
    assert(allPairs.size === 69 &&
      (allPairs intersect truePairs).size === 34,
      s"fixture drift: all-pairs mined ${allPairs.size}, " +
        s"true ${(allPairs intersect truePairs).size}")
    def minedAt(nProbe: Int): Set[(Long, Long)] = {
      def lists(q: org.apache.spark.sql.DataFrame,
          c: org.apache.spark.sql.DataFrame) =
        Similarity.ivfTopK(q, c, k, nCells = 8, nProbe = nProbe,
          idCol = "id", vecCol = "v", boundedQueries = false,
          excludeSelf = false)
      rows(Retrieval.bitextMineFromCandidates(srcDf, tgtDf, "id", "v",
        lists(srcDf, tgtDf), lists(tgtDf, srcDf), k, thr))
    }
    // the measured curve (also recorded in Retrieval's scaladoc table):
    //   nProbe   mined   ∩all-pairs   recovered-true   extras
    //      8       69        69             34            0
    //      6       69        69             34            0
    //      4       70        68             34            2
    //      2       70        66             32            4
    //      1       71        65             32            6
    val expected = Map(
      8 -> (69, 69, 34), 6 -> (69, 69, 34), 4 -> (70, 68, 34),
      2 -> (70, 66, 32), 1 -> (71, 65, 32))
    val curve = Seq(8, 6, 4, 2, 1).map { p =>
      val m = minedAt(p)
      val (sz, inAll, recov) = expected(p)
      assert(m.size === sz && (m intersect allPairs).size === inAll &&
        (m intersect truePairs).size === recov,
        s"nProbe=$p: mined=${m.size} inAll=${(m intersect allPairs).size} " +
          s"true=${(m intersect truePairs).size} — curve moved")
      p -> m
    }.toMap
    // recall 1 (nProbe = nCells): exact equality, zero extras
    assert(curve(8) === allPairs)
    // gentle-decay floor: ≥ 94% of the recall-1 true pairs survive even
    // single-probe retrieval, and recovery is monotone in nProbe
    assert((curve(1) intersect truePairs).size >= 32)
    assert(Seq(1, 2, 4, 6, 8)
      .map(p => (curve(p) intersect truePairs).size)
      .sliding(2).forall { case Seq(a, b) => a <= b },
      "true-pair recovery is not monotone in nProbe")
    // the margin-inflation finding, pinned as a POSITIVE assertion so a
    // future 'fix' that silently changes the semantics trips it: below
    // full recall, extras exist, grow as probes shrink, and are
    // distractor-side artifacts — no planted SRC is ever mis-mined to a
    // wrong target at any probe count
    assert((curve(6) -- allPairs).isEmpty)
    assert(Seq(4, 2, 1).map(p => (curve(p) -- allPairs).size) === Seq(2, 4, 6))
    curve.values.foreach(m => m.filter(_._1 <= 40L).foreach { case (s, t) =>
      assert(t === 1000L + s, s"planted src $s mis-mined to $t")
    })
  }

  test("annTopKBitext (one hashing pass per side) is row-identical to " +
      "two annTopK(excludeSelf = false) calls, both directions") {
    import graft.llm.Similarity
    // the optimization claim is EXACT equality, not approximate: the md5
    // hyperplanes are data-independent, so hashing a side once and
    // reusing the index across directions must reproduce the two-call
    // rows bit-for-bit. Colliding-id fixture on purpose — the shared
    // path must also preserve the no-self-exclusion contract.
    val srcDf = bitextSrc.zipWithIndex
      .map { case ((_, v), i) => (i.toLong, v) }.toDF("id", "v")
    val tgtDf = bitextTgt.zipWithIndex
      .map { case ((_, v), i) => (i.toLong, v) }.toDF("id", "v")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val (fwd, bwd) = Similarity.annTopKBitext(srcDf, tgtDf, k = 3,
      tables = 4, bits = 4, idCol = "id", vecCol = "v")
    assert(rows(fwd) === rows(Similarity.annTopK(srcDf, tgtDf, k = 3,
      tables = 4, bits = 4, idCol = "id", vecCol = "v",
      excludeSelf = false)))
    assert(rows(bwd) === rows(Similarity.annTopK(tgtDf, srcDf, k = 3,
      tables = 4, bits = 4, idCol = "id", vecCol = "v",
      excludeSelf = false)))
    assert(rows(fwd).nonEmpty && rows(bwd).nonEmpty, "fixture inert")
  }

  test("autoLshBits: the width rule's arithmetic is pinned and " +
      "annTopK(bits = 0) equals the explicit call at the computed width") {
    import graft.llm.Similarity
    // 2^bits ≈ n / 16, clamped [4, 20] — the LSH analog of ivfTopK's √n
    // cell rule (fixed width makes candidate volume n²/2^bits; the
    // ScaleProbe bitext_lsh row metered it 15.94x at 4x sides)
    assert(Similarity.autoLshBits(0L) === 4)
    assert(Similarity.autoLshBits(256L) === 4)
    assert(Similarity.autoLshBits(257L) === 5)
    assert(Similarity.autoLshBits(2000L) === 7)
    assert(Similarity.autoLshBits(8000L) === 9)
    assert(Similarity.autoLshBits(4096L) === 8) // the historical default
    assert(Similarity.autoLshBits(Long.MaxValue) === 20)
    val srcDf = bitextSrc.toDF("id", "v")
    val tgtDf = bitextTgt.toDF("id", "v")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    // 5-row corpus → autoLshBits = 4; the auto call must be bit-identical
    // to the explicit one (the rule picks a width, nothing else changes)
    val auto = rows(Similarity.annTopK(srcDf, tgtDf, k = 3, tables = 4,
      bits = 0, idCol = "id", vecCol = "v", excludeSelf = false))
    assert(auto === rows(Similarity.annTopK(srcDf, tgtDf, k = 3,
      tables = 4, bits = 4, idCol = "id", vecCol = "v",
      excludeSelf = false)))
    assert(auto.nonEmpty)
    val (af, ab) = Similarity.annTopKBitext(srcDf, tgtDf, k = 3,
      tables = 4, bits = 0, idCol = "id", vecCol = "v")
    val (ef, eb) = Similarity.annTopKBitext(srcDf, tgtDf, k = 3,
      tables = 4, bits = 4, idCol = "id", vecCol = "v")
    assert(rows(af) === rows(ef) && rows(ab) === rows(eb))
    // bits = 0 row-identity SCOPING (r16 advice): annTopKBitext picks
    // ONE width from the LARGER side, while the two-call annTopK form
    // auto-sizes each direction from its own corpus — so when unequal
    // side sizes straddle an autoLshBits boundary the smaller-corpus
    // direction runs at different widths in the two forms, and the
    // row-identity claim is scoped to explicit-bits callers (the
    // equality pinned in the previous test uses bits = 4). Pin the
    // divergent width arithmetic for a 600-vs-64-sided call: the
    // shared index would run 6 bits in both directions, the two-call
    // form would search the 64-vector corpus at 4.
    assert(Similarity.autoLshBits(64L) === 4)
    assert(Similarity.autoLshBits(600L) === 6)
  }

  test("pqTopK corpus-mining contract: boundedQueries = false (shuffled " +
      "LUT rows) is row-identical to the bounded heap scan; " +
      "excludeSelf = false admits self rows; the bounded ceiling is a " +
      "loud runtime contract") {
    import graft.llm.Similarity
    val e = graft.Tables(spark, sf0001).embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.filter($"vec_id" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    // execution contract, not semantics: the distributed-LUT join path
    // must reproduce the driver-broadcast heap path bit-for-bit (same
    // m-term integer sums, same total orders)
    val bounded = rows(Similarity.pqTopK(q, e, k = 10,
      idCol = "vec_id", vecCol = "v"))
    val unbounded = rows(Similarity.pqTopK(q, e, k = 10,
      idCol = "vec_id", vecCol = "v", boundedQueries = false))
    assert(bounded === unbounded)
    assert(bounded.nonEmpty, "fixture inert")
    // excludeSelf = false (the cross-corpus contract): every query's own
    // row is a legitimate candidate — its approx score survives the
    // rerank cut and the exact cosine scores it 1.0
    val selfIn = Similarity.pqTopK(q, e, k = 10, idCol = "vec_id",
      vecCol = "v", boundedQueries = false, excludeSelf = false)
    assert(selfIn.where($"query_id" === $"neighbor_id" && $"sim" === 1.0)
      .count() === 10L, "self rows lost under excludeSelf = false")
    // and the two knobs commute: bounded mode admits the same self rows
    val selfInBounded = Similarity.pqTopK(q, e, k = 10, idCol = "vec_id",
      vecCol = "v", excludeSelf = false)
    assert(rows(selfIn) === rows(selfInBounded))
    // the bounded-queries ceiling is a parameter now (r16 advice) and
    // still a LOUD contract: 10 queries past a ceiling of 5 must raise,
    // not silently truncate
    val ex = intercept[IllegalArgumentException] {
      Similarity.pqTopK(q, e, k = 10, idCol = "vec_id", vecCol = "v",
        maxBoundedQueries = 5L).collect()
    }
    assert(ex.getMessage.contains("bounded-queries contract"))
  }

  test("bitextMineFromCandidates with COLLIDING id spaces: " +
      "excludeSelf = false keeps src_id == tgt_id candidates and " +
      "equals all-pairs; the self-search default would lose them") {
    import graft.llm.{Retrieval, Similarity}
    // two corpora EACH numbered from 0 (the common real-world case the
    // r15 advice flagged): renumber the planted fixture so the known
    // mutual-best pair (src 0 ↔ tgt 101) becomes (0, 0) — a true pair
    // whose ids collide across sides
    val srcDf = bitextSrc.zipWithIndex
      .map { case ((_, v), i) => (i.toLong, v) }.toDF("id", "v")
    val tgtDf = bitextTgt.zipWithIndex
      .map { case ((_, v), i) => (i.toLong, v) }.toDF("id", "v")
    def lists(excl: Boolean)(q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(q, c, k = BitextFixtureK, nCells = 3, nProbe = 3,
        idCol = "id", vecCol = "v", boundedQueries = false,
        excludeSelf = excl)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val allPairs = rows(Retrieval.bitextMine(srcDf, tgtDf, "id", "v",
      k = BitextFixtureK, marginThresholdMicro = BitextFixtureThr))
    // fixture validity: the geometry must actually mine a colliding pair,
    // otherwise this test can't distinguish the two modes
    assert(allPairs.exists { case (s, t, _, _) => s == t },
      s"fixture lost its colliding true pair: $allPairs")
    val fed = rows(Retrieval.bitextMineFromCandidates(srcDf, tgtDf,
      "id", "v", lists(excl = false)(srcDf, tgtDf),
      lists(excl = false)(tgtDf, srcDf),
      k = BitextFixtureK, marginThresholdMicro = BitextFixtureThr))
    assert(fed === allPairs)
    // contrast: the self-search default silently erases every colliding
    // candidate — the divergence the excludeSelf flag exists to prevent
    val fedSelfSearch = rows(Retrieval.bitextMineFromCandidates(srcDf,
      tgtDf, "id", "v", lists(excl = true)(srcDf, tgtDf),
      lists(excl = true)(tgtDf, srcDf),
      k = BitextFixtureK, marginThresholdMicro = BitextFixtureThr))
    assert(!fedSelfSearch.exists { case (s, t, _, _) => s == t })
    assert(fedSelfSearch !== allPairs)
  }

  test("bitextMine k guard: out-of-range k fails loudly (margin-overflow " +
      "bound), in-range extremes are accepted") {
    import graft.llm.Retrieval
    val srcDf = bitextSrc.toDF("id", "v")
    val tgtDf = bitextTgt.toDF("id", "v")
    for (bad <- Seq(0, -1, 2001)) {
      val e = intercept[IllegalArgumentException] {
        Retrieval.bitextMine(srcDf, tgtDf, "id", "v", k = bad)
      }
      assert(e.getMessage.contains("[1, 2000]"))
      intercept[IllegalArgumentException] {
        Retrieval.bitextMineFromCandidates(srcDf, tgtDf, "id", "v",
          srcDf.limit(0).selectExpr("id as query_id", "id as neighbor_id"),
          tgtDf.limit(0).selectExpr("id as query_id", "id as neighbor_id"),
          k = bad)
      }
    }
    // k = 2000 is inside the exact bound (2·10¹²·k² < 2⁶³ ⇔ k ≤ 2147)
    Retrieval.bitextMine(srcDf, tgtDf, "id", "v", k = 2000).collect()
  }
}
