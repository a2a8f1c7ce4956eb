package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfKeywords ranks rare terms above common ones, ties on term") {
    // 'apple' appears in every doc (df=3); each doc also has a unique term
    val df = Seq(
      (1L, "apple unique1 apple"),
      (2L, "apple unique2"),
      (3L, "apple unique3 unique3")
    ).toDF("doc_id", "text")
    val out = CorpusStats.tfidfKeywords(df, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // df(uniqueN)=1 beats df(apple)=3 even when apple's tf is higher:
    // doc 1 has tf(apple)=2 → key 2e9/3 = 666M < tf(unique1)=1 → key 1e9
    assert(out === Map(1L -> "unique1", 2L -> "unique2", 3L -> "unique3"))
  }

  test("tfidfKeywords rank is dense within doc and capped at k") {
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = CorpusStats.tfidfKeywords(df, "doc_id", "text", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(5)).toSeq === Seq(1L, 2L, 3L))
    // all terms tie on key (tf=1, df=1) → order is alphabetical
    assert(out.map(_.getString(1)).toSeq === Seq("a", "b", "c"))
  }

  test("bigramLmScore: a doc of corpus-frequent bigrams scores lower nll") {
    val common = (1 to 6).map(i => (i.toLong, "the cat sat on the mat"))
    val df = (common :+ (99L, "zq xv qp wk jn bz"))
      .toDF("doc_id", "text")
    val out = CorpusStats.bigramLmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) < out(99L),
      s"frequent-bigram doc should have lower avg nll: $out")
    // all six identical docs get the identical score
    assert((1 to 6).map(i => out(i.toLong)).toSet.size === 1)
  }

  test("bigramLmScore omits docs with fewer than 2 tokens") {
    val df = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
    val ids = CorpusStats.bigramLmScore(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(2L))
  }

  test("removeRepeatedSpans cuts planted spans, keeps unique text") {
    val footer = (1 to 6).map(i => s"f$i").mkString(" ") // 6-token footer
    val df = (1 to 5).map(i => (i.toLong, s"unique${i}a unique${i}b $footer"))
      .toDF("doc_id", "text")
    val out = CorpusStats.removeRepeatedSpans(df, "doc_id", "text",
      spanTokens = 6, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1)
    out.foreach { case (id, nTok, nRem, clean) =>
      assert(nTok === 8L)
      assert(nRem === 6L, s"doc $id should lose exactly the footer")
      assert(clean === s"unique${id}a unique${id}b")
    }
  }

  test("removeRepeatedSpans keeps short and unique docs intact") {
    val df = Seq(
      (1L, "too short"), // shorter than one span
      (2L, "entirely unique words that repeat nowhere else at all ok")
    ).toDF("doc_id", "text")
    val out = CorpusStats.removeRepeatedSpans(df, "doc_id", "text",
      spanTokens = 6, maxDf = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L))
  }

  test("degenerate corpora: all-identical docs, empty text, one giant doc") {
    // all-identical: every term ties (same tf, df=n) → alphabetical top-k;
    // tfidf must not blow up on total rank ties
    val same = (1 to 6).map(i => (i.toLong, "b a c b")).toDF("doc_id", "text")
    val top = CorpusStats.tfidfKeywords(same, "doc_id", "text", k = 2)
      .filter($"doc_id" === 1L).orderBy("rank")
      .collect().map(_.getString(1))
    assert(top.toSeq === Seq("b", "a")) // tf=2 beats tf=1; then alphabetical
    // empty text tokenizes to one "" token — survives all three ops
    val empty = Seq((1L, ""), (2L, "x y")).toDF("doc_id", "text")
    assert(CorpusStats.tfidfKeywords(empty, "doc_id", "text", 3).count() === 3)
    assert(CorpusStats.removeRepeatedSpans(empty, "doc_id", "text", 2, 1)
      .count() === 2)
    assert(CorpusStats.bigramLmScore(empty, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet === Set(2L))
    // one giant doc among small ones: per-doc work is bounded by doc size,
    // and the giant's spans are unique → untouched
    val giant = (1 to 3).map(i => (i.toLong, s"tiny$i doc")) :+
      (99L, (1 to 5000).map(j => s"g$j").mkString(" "))
    val out = CorpusStats.removeRepeatedSpans(
      giant.toDF("doc_id", "text"), "doc_id", "text", 20, 1)
      .filter($"doc_id" === 99L).head()
    assert(out.getLong(1) === 5000L && out.getLong(2) === 0L)
  }

  test("incremental span removal equals the batch recompute on fresh rows") {
    val footer = (1 to 6).map(i => s"f$i").mkString(" ")
    val old = (1 to 3).map(i => (i.toLong, s"old${i}a old${i}b $footer"))
      .toDF("doc_id", "text")
    val fresh = (4 to 6).map(i => (i.toLong, s"new${i}a new${i}b $footer"))
      .toDF("doc_id", "text")
    val idx = CorpusStats.spanDfIndex(old, "doc_id", "text", spanTokens = 6)
    val (cleaned, freshIdx) = CorpusStats.removeRepeatedSpansIncremental(
      idx, fresh, "doc_id", "text", spanTokens = 6, maxDf = 3)
    val batch = CorpusStats.removeRepeatedSpans(
      old.unionByName(fresh), "doc_id", "text", spanTokens = 6, maxDf = 3)
      .filter($"doc_id" >= 4L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(rows(cleaned) === rows(batch))
    // the footer reached df=6 > 3 only ACROSS the index merge: each side
    // alone has df=3, so the incremental path genuinely used the index
    assert(rows(cleaned).forall(_._3 === 6L))
    // merged index round-trips: merging fresh rows in gives the union's df
    val merged = CorpusStats.mergeSpanDfIndex(idx, freshIdx)
    val full = CorpusStats.spanDfIndex(old.unionByName(fresh), "doc_id",
      "text", spanTokens = 6)
    assert(merged.orderBy("h").collect().toSeq ===
      full.orderBy("h").collect().toSeq)
  }

  test("removeRepeatedSpans: overlapping frequent spans merge their cover") {
    // every doc is the same 8 tokens → every 6-token span (3 of them) is
    // frequent; the union covers all 8 positions → clean_text empty
    val df = (1 to 4).map(i => (i.toLong, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val out = CorpusStats.removeRepeatedSpans(df, "doc_id", "text",
      spanTokens = 6, maxDf = 3)
      .collect().map(r => (r.getLong(2), r.getString(3))).distinct
    assert(out.toSeq === Seq((8L, "")))
  }

  test("dropRepeatedParagraphs cuts shared paragraphs, keeps order and edge docs") {
    val footer = "cookie banner text"
    val df = Seq(
      (1L, s"$footer\nbody one"),          // leading boilerplate
      (2L, s"body two\n$footer"),          // trailing
      (3L, s"body three\n\n$footer\nmore three"), // middle + blank para
      (4L, footer),                         // fully boilerplate
      (5L, "  \n "),                        // only blank paragraphs
      (6L, "untouched doc")
    ).toDF("doc_id", "text")
    val out = CorpusStats.dropRepeatedParagraphs(df, "doc_id", "text", maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 2L, 1L, "body one"),
      (2L, 2L, 1L, "body two"),
      (3L, 3L, 1L, "body three\nmore three"),
      (4L, 1L, 1L, ""),
      (5L, 0L, 0L, ""),
      (6L, 1L, 0L, "untouched doc")))
    // below the df threshold nothing is cut (footer df = 4 <= maxDf = 4)
    val keep = CorpusStats.dropRepeatedParagraphs(df, "doc_id", "text", maxDf = 4)
      .agg(sum("n_removed")).head().getLong(0)
    assert(keep === 0L)
  }

  test("stupidBackoffScore: every backoff level matches the hand-computed cascade") {
    import graft.functions.PortableMath
    val ln04 = CorpusStats.StupidBackoffDiscountMicro
    assert(ln04 === PortableMath.microLnSignedRef(2, 5))
    val train = Seq((0L, "a b c d")).toDF("doc_id", "text")
    // trigram counts: (a,b,c)=1, (b,c,d)=1; bigrams ab/bc/cd=1; N=4
    val fresh = Seq(
      (1L, "a b c"), // attested trigram: lp = L(1, c(ab)=1) = 0
      (2L, "x b c"), // bigram backoff: lp = ln04 + L(c(bc)=1, c(b)=1) = ln04
      (3L, "x y c"), // unigram backoff: lp = 2·ln04 + L(c(c)=1, N=4)
      (4L, "x y z"), // unseen unigram: count clamps to 1 → same as doc 3
      (5L, "a b")    // < 3 tokens → no row
    ).toDF("doc_id", "text")
    val got = CorpusStats.stupidBackoffScore(train, fresh, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val l14 = PortableMath.microLnSignedRef(1, 4)
    val expect = Seq(
      (1L, 1L, 0L),
      (2L, 1L, -ln04),
      (3L, 1L, -(2 * ln04 + l14)),
      (4L, 1L, -(2 * ln04 + l14)))
    assert(got.toSeq === expect)
  }

  test("perplexityBuckets: per-language terciles follow the (nll, id) total order") {
    // one language, 5 scorable docs → ntile(3) sizes 2/2/1; repetition of a
    // corpus-common bigram lowers a doc's avg NLL (more predictable)
    val docs = Seq(
      (1L, "en", "p q p q p q p q"), // most predictable → head
      (2L, "en", "p q p q r s"),
      (3L, "en", "p q r s t u"),
      (4L, "en", "r s t u v w"),
      (5L, "en", "t u v w x y"),
      (6L, "en", "solo") // 1 token → absent
    ).toDF("doc_id", "lang", "text")
    val got = CorpusStats.perplexityBuckets(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.length === 5)
    // bucket sizes 2/2/1 and bucket follows the avg_nll ordering
    val byBucket = got.groupBy(_._5).view.mapValues(_.map(_._1).toSet).toMap
    val sorted = got.sortBy(v => (v._3, v._1)).map(_._1)
    assert(byBucket("head") === sorted.take(2).toSet)
    assert(byBucket("middle") === sorted.slice(2, 4).toSet)
    assert(byBucket("tail") === sorted.drop(4).toSet)
    assert(got.forall(v => (v._4 >= 1L && v._4 <= 3L)))
  }

  test("Reserved guard covers every working column the file actually uses") {
    // keep the Reserved set honest by grepping the source for .as("...") /
    // AS-column usages — a new working column that skips the guard would
    // let a colliding idCol silently join wrong
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/main/scala/graft/llm/CorpusStats.scala")), "UTF-8")
    val declared = """\.as\("([a-z_0-9]+)"\)""".r
      .findAllMatchIn(src).map(_.group(1)).toSet
    val guarded = declared.filter { c =>
      intercept[IllegalArgumentException] {
        CorpusStats.tfidfKeywords(
          Seq((1L, "x")).toDF(c, "text"), c, "text", 1)
      }.getMessage.contains("collides")
      true
    }
    assert(guarded === declared) // every declared working column is Reserved
    // and the microLn stage columns are in there too
    graft.functions.PortableMath.microLnColumns.foreach { c =>
      val e = intercept[IllegalArgumentException] {
        CorpusStats.bigramLmScore(Seq((1L, "a b")).toDF(c, "text"), c, "text")
      }
      assert(e.getMessage.contains("collides"), s"column $c not guarded")
    }
  }

  test("vocabTopKSketch equals the plain aggregation on every path") {
    def plain(df: org.apache.spark.sql.DataFrame, k: Int) = df
      .select(org.apache.spark.sql.functions.explode(
        TextOps.tokens(org.apache.spark.sql.functions.col("text"))).as("token"))
      .groupBy("token").count().withColumnRenamed("count", "freq")
      .orderBy(org.apache.spark.sql.functions.col("freq").desc,
        org.apache.spark.sql.functions.col("token").asc).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    def sketch(df: org.apache.spark.sql.DataFrame, k: Int, cap: Int) =
      CorpusStats.vocabTopKSketch(df, "text", k, cap)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    // (a) clean path: capacity far above vocab, no eviction anywhere
    val small = (1L to 50L).map(i => (i, s"tok${i % 7} tok${i % 3} fixed"))
      .toDF("doc_id", "text").repartition(8)
    assert(sketch(small, 5, 4096) === plain(small, 5))

    // (b) certified lossy path: heavy hitters dominate a long random tail,
    // tiny capacity forces evictions but the top-2 certify
    val rnd = new scala.util.Random(7)
    val skewed = (1L to 400L).map { i =>
      val hot = if (i % 2 == 0) "alpha alpha alpha beta beta" else "alpha beta"
      (i, s"$hot u${rnd.nextInt(100000)}x${i}")
    }.toDF("doc_id", "text").repartition(4)
    assert(sketch(skewed, 2, 8) === plain(skewed, 2))

    // (c) fallback path: uniform tokens, capacity too small to certify —
    // output must STILL be the exact top-k
    val uniform = (1L to 300L).map(i => (i, s"w${i % 40} w${(i + 13) % 40}"))
      .toDF("doc_id", "text").repartition(4)
    assert(sketch(uniform, 10, 4) === plain(uniform, 10))
  }

  test("oovRate: exact per-doc OOV counts and floored micro rate") {
    val docs = Seq(
      (1L, "aa bb cc"),     // 1 of 3 OOV → 333333
      (2L, "aa aa"),        // 0 OOV
      (3L, "zz yy xx")      // all OOV
    ).toDF("doc_id", "text")
    val vocab = Seq("aa", "bb").toDF("word")
    val got = CorpusStats.oovRate(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(1L) === ((3L, 1L, 333333L)))
    assert(got(2L) === ((2L, 0L, 0L)))
    assert(got(3L) === ((3L, 3L, 1000000L)))
  }

  test("shardManifest: layout-independent; edits, drops, and even-duplications all visible") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i % 4, i, s"text of doc $i"))
      .toDF("shard", "doc_id", "text")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.shardManifest(df, "shard", "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
    val base = manifest(docs)
    assert(base.keySet === Set(0L, 1L, 2L, 3L))
    assert(manifest(docs.repartition(7)) === base) // order-insensitive fold
    // a one-character edit moves exactly its shard's fold, nothing else
    val edited = manifest(docs.withColumn("text",
      when($"doc_id" === 5L, lit("text of doc 5!")).otherwise($"text")))
    assert(edited(1L) !== base(1L))
    assert(edited.filterKeys(_ != 1L).toMap ===
      base.filterKeys(_ != 1L).toMap)
    // a dropped doc moves count, tokens, and fold
    assert(manifest(docs.filter($"doc_id" =!= 8L))(0L) !== base(0L))
    // XOR blind spot closed by n_docs: duplicating a row TWICE cancels
    // the fold but not the count
    val dup2 = manifest(docs.unionByName(
      docs.filter($"doc_id" === 9L)).unionByName(
      docs.filter($"doc_id" === 9L)))
    assert(dup2(1L)._3 === base(1L)._3) // fold cancels (documented)
    assert(dup2(1L)._1 !== base(1L)._1) // count catches it
  }

  test("countMinSketch: linear/mergeable — half sketches sum cell-wise to the union sketch") {
    import spark.implicits._
    val a = Seq((1L, "x x y"), (2L, "y z z z")).toDF("doc_id", "text")
    val b = Seq((3L, "x w w"), (4L, "z y")).toDF("doc_id", "text")
    def cells(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.countMinSketch(df, "text", depth = 3, width = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap.withDefaultValue(0L)
    val ca = cells(a); val cb = cells(b); val cu = cells(a.unionByName(b))
    assert((ca.keySet ++ cb.keySet) === cu.keySet)
    cu.keys.foreach(k => assert(ca(k) + cb(k) === cu(k), s"cell $k"))
  }

  test("cmsEstimates: overcount-only, exact at collision-free width, and replays an md5 reference") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = CorpusStats.cmsEstimates(docs, "text", k = 4, depth = 4,
        width = 256)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got.keySet === Set("a", "b", "c", "d"))
    val exact = Map("a" -> 4L, "b" -> 3L, "c" -> 1L, "d" -> 1L)
    got.foreach { case (t, (freq, est)) =>
      assert(freq === exact(t))
      assert(est >= freq, s"CMS must never undercount ($t)")
    }
    // independent replay of the documented bucket function: first 40 bits
    // of md5("row:token") mod width, estimate = min cell
    def bucket(r: Int, tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 10)
      java.lang.Long.parseLong(hex, 16) % 256
    }
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
      .withDefaultValue(0L)
    exact.foreach { case (tok, n) =>
      (0 until 4).foreach(r => cells((r, bucket(r, tok))) += n)
    }
    got.foreach { case (tok, (_, est)) =>
      val ref = (0 until 4).map(r => cells((r, bucket(r, tok)))).min
      assert(est === ref, s"estimate for $tok must equal the md5 replay")
    }
  }

  test("zipfAlpha: Hill estimate vs the staged-ln JVM reference; degenerate and guard") {
    import spark.implicits._
    import graft.functions.PortableMath
    // frequencies 8/4/2 via planted repetition
    val docs = Seq(("a " * 8) + ("b " * 4) + ("c " * 2)).toDF("text")
    val r = CorpusStats.zipfAlpha(docs, "text", k = 3).head()
    val s = PortableMath.microLnSignedRef(8, 2) +
      PortableMath.microLnSignedRef(4, 2) +
      PortableMath.microLnSignedRef(2, 2)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 2L, s, 3000000000000L / s)))
    // k above the vocabulary size clamps to k_eff
    assert(CorpusStats.zipfAlpha(docs, "text", k = 64).head().getLong(0)
      === 3L)
    // all-equal head: no measurable decay → pinned 0
    val even = Seq("x y z").toDF("text")
    assert(CorpusStats.zipfAlpha(even, "text", k = 3).head().getLong(3)
      === 0L)
    // a vocabulary of one token cannot carry a tail
    val e = intercept[IllegalArgumentException] {
      CorpusStats.zipfAlpha(Seq("solo solo").toDF("text"), "text")
    }
    assert(e.getMessage.contains("< 2"))
  }

  test("substring keeper state refuses non-integral ids loudly") {
    // the persisted keeper is typed BIGINT and the streaming contract
    // orders ids numerically — a silent string→long cast would null out
    // and disable the cut, so both entry points must refuse instead
    val df = Seq(("doc-1", "w1 w2 w3")).toDF("id", "text")
    Seq(
      () => CorpusStats.substrKeeperIndex(df, "id", "text", 2),
      () => CorpusStats.removeDuplicateSubstringsIncremental(
        CorpusStats.substrKeeperIndex(
          Seq((1L, "a b")).toDF("id", "text"), "id", "text", 2),
        df, "id", "text", 2)
    ).foreach { call =>
      val e = intercept[IllegalArgumentException](call())
      assert(e.getMessage.contains("integral id"))
    }
  }

  test("zipfAlphaByGroup: per-group Hill equals the global estimator on " +
      "that group alone; flat and thin groups pin 0") {
    val docs = Seq(
      ("en", "a a a a a a b b b c c d"),
      ("en", "a a b c d e"),
      ("fr", "u u u u v v w"),
      ("fr", "u v w x x"),
      ("flat", "p q r s"), // all top-k freqs equal → Σln = 0 → 0
      ("thin", "z") // vocabulary of 1 → k_eff < 2 → 0 (no group require)
    ).toDF("lang", "text")
    val by = CorpusStats.zipfAlphaByGroup(docs, "lang", "text", k = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    for (g <- Seq("en", "fr")) {
      val solo = CorpusStats.zipfAlpha(
        docs.filter(col("lang") === g), "text", k = 4).head()
      assert(by(g) === ((solo.getLong(0), solo.getLong(3))), g)
    }
    assert(by("flat")._2 === 0L)
    assert(by("thin") === ((1L, 0L)))
    // group columns that collide with working columns refuse loudly
    val e = intercept[IllegalArgumentException] {
      CorpusStats.zipfAlphaByGroup(docs.withColumnRenamed("lang", "freq"),
        "freq", "text")
    }
    assert(e.getMessage.contains("collides"))
  }
}
