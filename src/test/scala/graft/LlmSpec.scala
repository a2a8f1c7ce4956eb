package graft

import graft.llm._
import org.apache.spark.sql.functions._

class LlmSpec extends SparkSpec {
  import spark.implicits._

  test("simhash64: identical text → hamming 0; near-identical → small hamming") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words entirely unrelated content here now")
    ).toDF("id", "text")
    val fp = df.select($"id", TextOps.simhash64("text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(4L)))
  }

  test("simhashNearDups finds exact dups via chunk blocking") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0)))
  }

  test("Dedup.exact: min-id survivor, copy counting") {
    val df = Seq((10L, "same"), (3L, "same"), (7L, "other")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq((3L, 2L), (7L, 1L)))
  }

  test("minhashNearDups: subset-shingle near-dup is found, unrelated is not") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val trunc = (1 to 32).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, trunc), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("survivorAssignment: chains collapse to min-id; applySurvivors keeps one per component") {
    // component {1,2,3} as a CHAIN (1-2, 2-3: transitive, not a clique),
    // component {7,9}, and 5 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.survivorAssignment(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))

    val corpus = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val kept = Dedup.applySurvivors(corpus, "doc_id", Dedup.survivorAssignment(pairs))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 5L, 7L))
  }

  test("dropNearDuplicates keeps min-id survivor per near-dup cluster plus uniques") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val trunc = (1 to 32).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, trunc), (3L, other)).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L)) // 2 is 1's near-dup; 3 is unique
  }

  test("nearDupsVsReference: exact pairs vs a broadcast suite; drop form anti-joins") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val trunc = (1 to 32).map(i => s"tok$i").mkString(" ")   // jac 30/38 ≈ .79
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val corpus = Seq((1L, base), (2L, other), (3L, "tiny doc here"))
      .toDF("doc_id", "text")
    val ref = Seq((901L, trunc), (902L, "nothing in common at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDupsVsReference(corpus, ref, "doc_id", "text",
      shingleN = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((1L, 901L)))
    // exact jaccard: corpus doc has 38 distinct 3-shingles, ref 30, all
    // ref shingles are a prefix subset → inter 30, union 38
    assert(math.abs(pairs.head._3 - 30.0 / 38.0) < 1e-12)
    // corpus-vs-corpus and ref-vs-ref pairs never appear; drop form keeps
    // every non-contaminated row
    val kept = Dedup.dropNearDupsOfReference(corpus, ref, "doc_id", "text",
      shingleN = 3, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
    // the guard trips on an over-budget reference instead of broadcasting it
    val e = intercept[IllegalArgumentException] {
      Dedup.nearDupsVsReference(corpus, ref, "doc_id", "text",
        maxRefShingles = 10L)
    }
    assert(e.getMessage.contains("maxRefShingles"))
  }

  test("rougeLVsReference: hand LCS, tie-break, prune-equals-naive, drop form") {
    def tok(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", graft.llm.TextOps.tokens($"text").as("toks"))
    // LCS("the cat sat on mat", "the dog sat on the mat") = 4
    // (the, sat, on, mat); la=5, lb=6 → 2·4e6/11 = 727272 → flagged at 0.7
    val corpus = tok(Seq((1L, "the cat sat on mat"),
      (2L, "completely unrelated words here")).toDF("doc_id", "text"))
    val ref = tok(Seq((10L, "the dog sat on the mat"),
      (11L, "the cat sat on mat")).toDF("doc_id", "text"))
    val rows = Dedup.rougeLVsReference(corpus, ref, "doc_id", "toks",
      "doc_id", "toks").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    // doc 1 matches ref 11 exactly (1e6 beats 727272 vs ref 10)
    assert(rows(1L) === ((11L, 5L, 1000000L, true)))
    assert(!rows(2L)._4 && rows(2L)._3 < 700000L)
    // score tie resolves to the SMALLEST ref id: two identical refs
    val ref2 = tok(Seq((20L, "the cat sat on mat"),
      (21L, "the cat sat on mat")).toDF("doc_id", "text"))
    val best = Dedup.rougeLVsReference(corpus, ref2, "doc_id", "toks",
      "doc_id", "toks").filter($"id" === 1L).head()
    assert(best.getLong(1) === 20L)
    // the overlap-bound prune never changes the answer: compare against
    // a naive no-prune LCS over deterministic pseudo-random token seqs
    def lcsNaive(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val rnd = new scala.util.Random(7)
    val docs = (1L to 20L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(10))(s"t${rnd.nextInt(8)}")))
    val refsR = (100L to 106L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(10))(s"t${rnd.nextInt(8)}")))
    val got = Dedup.rougeLVsReference(
      docs.toDF("doc_id", "toks"), refsR.toDF("doc_id", "toks"),
      "doc_id", "toks", "doc_id", "toks").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    docs.foreach { case (id, a) =>
      val want = refsR.map { case (rid, b) =>
        (rid, 2L * 1000000L * lcsNaive(a, b) / (a.length + b.length))
      }.maxBy { case (rid, s) => (s, -rid) }
      assert(got(id) === ((want._1, want._2)), s"doc $id")
    }
    // drop form anti-joins the flagged ids
    val full = Seq((1L, "the cat sat on mat"),
      (2L, "completely unrelated words here")).toDF("doc_id", "text")
    val refT = Seq((10L, "the dog sat on the mat")).toDF("doc_id", "text")
    assert(Dedup.dropRougeLOfReference(full, refT, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(2L))
    // broadcast guard trips loudly
    val e = intercept[IllegalArgumentException] {
      Dedup.rougeLVsReference(corpus, ref, "doc_id", "toks", "doc_id",
        "toks", maxRefTokens = 3L)
    }
    assert(e.getMessage.contains("maxRefTokens"))
  }

  test("dropNearDuplicatesKeepBest keeps the highest-score family member") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val trunc = (1 to 32).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    // score favors the LATER doc 2 — min-id dedup would keep 1 instead
    val df = Seq((1L, base, 0.2), (2L, trunc, 0.9), (3L, other, 0.5))
      .toDF("doc_id", "text", "score")
    val kept = Dedup.dropNearDuplicatesKeepBest(df, "doc_id", "text", $"score")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
    // score ties fall back to min id — identical to dropNearDuplicates
    val tied = Seq((1L, base, 0.5), (2L, trunc, 0.5), (3L, other, 0.5))
      .toDF("doc_id", "text", "score")
    val keptTied = Dedup.dropNearDuplicatesKeepBest(tied, "doc_id", "text", $"score")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptTied === Set(1L, 3L))
  }

  test("capPerGroup: top-n per group by (score desc, id asc), ranks attached") {
    val rows = (1 to 9).map(i => (i.toLong, if (i <= 5) "a" else "b", i / 10.0)) :+
      (10L, "a", 0.5) // ties doc 5 on score; id asc keeps 5 first
    val df = rows.toDF("doc_id", "src", "score")
    val got = Selection.capPerGroup(df, "src", $"score", "doc_id", n = 2)
      .select($"src", $"doc_id", $"rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq === Seq(("a", 5L, 1L), ("a", 10L, 2L), ("b", 9L, 1L), ("b", 8L, 2L)).sorted)
    // a "rank" collision on the input is refused, not silently overwritten
    val clash = intercept[IllegalArgumentException] {
      Selection.capPerGroup(df.withColumnRenamed("score", "rank"),
        "src", $"rank", "doc_id", n = 2)
    }
    assert(clash.getMessage.contains("rank"))
  }

  test("commonSpanPairs: shared 20-token span found; disjoint docs are not paired") {
    val span = (1 to 20).map(i => s"s$i").mkString(" ")
    val a = span + " " + (1 to 30).map(i => s"a$i").mkString(" ")
    val b = (1 to 30).map(i => s"b$i").mkString(" ") + " " + span
    val c = (100 to 160).map(i => s"c$i").mkString(" ")
    val short1 = "tiny doc"     // < 20 tokens → whole text is the span
    val short2 = "tiny doc"
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, short1), (5L, short2))
      .toDF("doc_id", "text")
    val got = Dedup.commonSpanPairs(df, "doc_id", "text", spanTokens = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (4L, 5L)))
  }

  test("minhashNearDupsIncremental === full recompute restricted to fresh-touching pairs") {
    // near-dup structure crossing the existing/fresh split: fresh 11 pairs
    // with existing 1 and 2 (fresh×existing), 12 is a copy of 11
    // (fresh×fresh), 13 is unique; existing pair (1,2) must NOT reappear.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val trunc = (1 to 32).map(i => s"tok$i").mkString(" ")
    val trunc2 = (1 to 36).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val uniq = (200 to 240).map(i => s"u$i").mkString(" ")
    val existing = Seq((1L, base), (2L, trunc), (3L, other)).toDF("doc_id", "text")
    val fresh = Seq((11L, trunc2), (12L, trunc2), (13L, uniq)).toDF("doc_id", "text")

    val idx = Dedup.minhashBandIndex(existing, "doc_id", "text")
    val incr = Dedup.minhashNearDupsIncremental(existing, idx, fresh, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val full = Dedup.minhashNearDups(existing.unionByName(fresh), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a >= 11L || b >= 11L }.toSet

    assert(incr === full)
    assert(incr.map { case (a, b, _) => (a, b) } ===
      Set((1L, 11L), (1L, 12L), (2L, 11L), (2L, 12L), (11L, 12L)))
  }

  test("minhashNearDups: maxBucketSize drops degenerate buckets, default keeps them") {
    // 30 identical docs: every band puts all 30 ids in one bucket
    val df = (1L to 30L).map(i => (i, (1 to 40).map(j => s"tok$j").mkString(" ")))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashNearDups(df, "doc_id", "text", maxBucketSize = 10)
    assert(capped.count() === 0L)
    val uncapped = Dedup.minhashNearDups(df, "doc_id", "text")
    assert(uncapped.count() === 30L * 29 / 2)
  }

  test("annTopK retrieves planted parallel duplicates at rank 1, sim 1.0") {
    val e = Tables(spark, sf0001).embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val dups = e.select(($"vec_id" + 100000).as("vec_id"),
      transform($"embedding", x => x * 1.1).as("embedding"))
    val queries = e.filter($"vec_id" < 5)
    val res = Similarity.annTopK(queries, e.unionByName(dups), k = 3)
      .filter($"rank" === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.length === 5)
    res.foreach { case (q, n, sim) =>
      assert(n === q + 100000, s"query $q should find its scaled copy")
      assert(sim === 1.0)
    }
  }

  test("annTopK: degenerate-bucket cap bounds candidates from a boilerplate bucket") {
    // 60 IDENTICAL vectors land in the same bucket of every LSH table; with
    // the cap below their count the bucket is dropped before the candidate
    // join, so one boilerplate cluster cannot multiply candidates for every
    // query that hashes into it
    val ones = Seq.fill(8)(1.0)
    val corpus = ((100L until 160L).map(id => (id, ones)) :+ ((1L, ones.updated(0, 0.9))))
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, ones)).toDF("vec_id", "embedding")
    val uncapped = Similarity.annTopK(queries, corpus, k = 5)
    assert(uncapped.count() === 5, "without the cap the boilerplate bucket floods top-k")
    val capped = Similarity.annTopK(queries, corpus, k = 5, maxBucketSize = 10)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(!capped.exists(_ >= 100L),
      "neighbors from the dropped mega-bucket must not appear as candidates")
  }

  test("ivfTopK retrieves planted parallel duplicates at rank 1, sim 1.0") {
    val e = Tables(spark, sf0001).embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val dups = e.select(($"vec_id" + 100000).as("vec_id"),
      transform($"embedding", x => x * 1.1).as("embedding"))
    val res = Similarity.ivfTopK(e.filter($"vec_id" < 5), e.unionByName(dups), k = 3)
      .filter($"rank" === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.length === 5)
    res.foreach { case (q, n, sim) =>
      assert(n === q + 100000, s"query $q should find its scaled copy in its own cell")
      assert(sim === 1.0)
    }
  }

  test("pqTopK retrieves planted parallel duplicates at rank 1, sim 1.0") {
    val e = Tables(spark, sf0001).embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val dups = e.select(($"vec_id" + 100000).as("vec_id"),
      transform($"embedding", x => x * 1.1).as("embedding"))
    val queries = e.filter($"vec_id" < 5)
    // a scaled copy normalizes to the identical unit vector → identical PQ
    // codes → approx sim ties the query's own code score → survives rerank
    val res = Similarity.pqTopK(queries, e.unionByName(dups), k = 3)
      .filter($"rank" === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.length === 5)
    res.foreach { case (q, n, sim) =>
      assert(n === q + 100000, s"query $q should find its scaled copy")
      assert(sim === 1.0)
    }
  }

  test("bruteForceTopK and annTopK agree on planted dups") {
    val e = Tables(spark, sf0001).embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
      .limit(50)
    val q = e.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(q, e, k = 5).collect()
    assert(brute.length === 15)
    assert(brute.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("Multimodal: feature extraction preserves ids, dims, byte counts") {
    val media = Multimodal.fromText(
      Tables(spark, sf0001).documents.limit(10), "doc_id", "text").as[MediaRecord]
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 10)
    assert(feats.forall(_.features.length === Multimodal.FeatureDim))
    assert(feats.forall(f => f.n_bytes > 0))
    assert(feats.forall(_.features.forall(v => v >= 0f && v <= 1f)))
  }

  test("Multimodal: resizeMeta clamps the long side, frameSamplePlan grids") {
    val df = Seq((1L, Array[Byte](1, 2))).toDF("media_id", "media")
      .withColumn("meta", struct(lit("img").as("format"),
        lit(2000).as("width"), lit(1000).as("height"), lit(100L).as("durationMs")))
    val resized = Multimodal.resizeMeta(df, maxSide = 500)
      .select($"meta.width", $"meta.height").head()
    assert(resized.getInt(0) === 500 && resized.getInt(1) === 250)
    val frames = Multimodal.frameSamplePlan(df, everyMs = 30).count()
    assert(frames === 4) // 0, 30, 60, 90
  }

  test("langId picks the dominant marker language deterministically") {
    val df = Seq("x the y and z the w", "der hund und der ball",
      "el gato los perros el", "le chat les chiens le").toDF("text")
    val got = df.select(TextOps.langId($"text")).as[String].collect()
    assert(got.toSeq === Seq("en", "de", "es", "fr"))
  }

  test("essReport: Kish identity by hand, degenerate and guard cases") {
    def ess(rows: Seq[(String, Long)]) =
      Selection.essReport(rows.toDF("g", "w"), $"w", Seq("g")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // even weights → 10⁶; (3,1) → 16/(2·10) = 0.8; one dominant weight
    // (9,1) → 100/(2·82) → 609756; all-zero pins 0
    val got = ess(Seq(("a", 1L), ("a", 1L), ("b", 3L), ("b", 1L),
      ("c", 9L), ("c", 1L), ("z", 0L), ("z", 0L)))
    assert(got("a") === ((2L, 1000000L)))
    assert(got("b") === ((2L, 800000L)))
    assert(got("c") === ((2L, 609756L)))
    assert(got("z") === ((2L, 0L)))
    // ungrouped form: one global row
    val g = Selection.essReport(Seq(1L, 1L, 1L, 1L).toDF("w"), $"w")
      .head()
    assert((g.getLong(0), g.getLong(1)) === ((4L, 1000000L)))
    // negative weights are not a sampling design
    val e = intercept[IllegalArgumentException] {
      Selection.essReport(Seq(-1L).toDF("w"), $"w")
    }
    assert(e.getMessage.contains("negative"))
  }

  test("scriptCounts/dominantScript: planted multiscript texts") {
    val df = Seq(
      "Привет мир",      // pure Cyrillic
      "hello 世界 123",   // Latin-dominant with Han + digits
      "ab АБ",           // latin/cyrillic tie → list order wins
      "12345",           // digits only → no writing script
      "مرحبا שלום"       // Arabic + Hebrew, Arabic longer
    ).toDF("text")
    val m = TextOps.scriptCounts($"text").toMap
    val got = df.select(m("latin").as("la"), m("cyrillic").as("cy"),
      m("han").as("ha"), m("arabic").as("ar"), m("hebrew").as("he"),
      m("digit").as("di"),
      TextOps.dominantScript($"text").as("dom")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(got(0) === ((0L, 9L, 0L, 0L, 0L, 0L, "cyrillic")))
    assert(got(1) === ((5L, 0L, 2L, 0L, 0L, 3L, "latin")))
    assert(got(2) === ((2L, 2L, 0L, 0L, 0L, 0L, "latin")))
    assert(got(3) === ((0L, 0L, 0L, 0L, 0L, 5L, "none")))
    assert(got(4) === ((0L, 0L, 0L, 5L, 4L, 0L, "arabic")))
  }

  test("Mixture.resampleToMixture: exact target proportions, equals plain rank") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, sf0001).documents
    val weights = Map("en" -> 3L, "zh" -> 1L)
    val got = Mixture.resampleToMixture(docs, "lang", weights, "doc_id")
      .select($"doc_id", $"lang")

    // exact integer-arithmetic targets
    val n = docs.filter($"lang".isin("en", "zh")).groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = math.min(n("en") * 4 / 3, n("zh") * 4 / 1)
    val want = Map("en" -> total * 3 / 4, "zh" -> total / 4)
    val gotCounts = got.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCounts === want)

    // same SET as the naive per-group hash-rank selection (the histogram
    // walk is an optimization, not a semantics change)
    val w = Window.partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)
    val naive = docs.filter($"lang".isin("en", "zh"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= when($"lang" === "en", want("en")).otherwise(want("zh")))
      .select($"doc_id", $"lang")
    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
  }

  test("decontaminate drops span-sharing docs, keeps clean ones") {
    val benchText = (1 to 12).map(i => s"bench$i").mkString(" ")
    val corpus = Seq(
      (1L, s"intro words then $benchText trailing content here"), // contains the eval span
      (2L, "totally unrelated clean document with its own words"),
      (3L, benchText)) // exactly the eval text
      .toDF("doc_id", "text")
    val heldout = Seq((100L, benchText)).toDF("doc_id", "text")
    val kept = Dedup.decontaminate(corpus, heldout, "doc_id", "text",
      spanTokens = 12).select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L))
  }

  test("topBoilerplateSpans surfaces the planted footer with its doc frequency") {
    val footer = (1 to 20).map(i => s"nav$i").mkString(" ")
    val docs = (1 to 8).map { i =>
      val body = (1 to 25).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, if (i % 2 == 0) s"$body $footer" else body)
    }.toDF("doc_id", "text")
    val top = Dedup.topBoilerplateSpans(docs, "doc_id", "text",
      spanTokens = 20, k = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.length === 1)
    assert(top.head === (footer, 4L))
  }

  test("decontaminate catches a SHORT held-out doc embedded verbatim in a long doc") {
    // the eval question is 4 tokens — far below spanTokens — and sits
    // inside doc 1's 20-token body; the whole-text span alone would miss it
    val q = "what is the capital"
    val corpus = Seq(
      (1L, s"some long page begins $q of france and then rambles onward forever"),
      (2L, "a clean unrelated page about something else entirely okay"))
      .toDF("doc_id", "text")
    val heldout = Seq((100L, q)).toDF("doc_id", "text")
    val kept = Dedup.decontaminate(corpus, heldout, "doc_id", "text",
      spanTokens = 13).select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L))
  }

  test("Packing: every token lands in exactly one slot; sequences fill to budget") {
    val docs = Tables(spark, sf0001).documents
    val budget = 64
    val nTok = TextOps.tokenCount($"text")
    val packed = Packing.packSequences(docs, "doc_id", nTok, budget, nShards = 4)
    val chunks = Packing.packChunks(docs, "doc_id", nTok, budget, nShards = 4)

    // chunk spans partition each document's tokens: contiguous from 0,
    // summing to n_tokens, each piece within (0, budget]
    val perDoc = chunks.groupBy($"doc_id")
      .agg(sum($"tok_len").as("covered"), min($"tok_start").as("first"),
        max($"tok_len").as("longest"))
      .join(packed, "doc_id")
    assert(perDoc.filter($"covered" =!= $"n_tokens" || $"first" =!= 0 ||
      $"longest" > budget).count() === 0)

    // every sequence except each shard's last holds exactly `budget` tokens
    val seqFill = chunks.groupBy($"shard", $"seq").agg(sum($"tok_len").as("fill"))
    val lastSeq = seqFill.groupBy($"shard").agg(max($"seq").as("last"))
    assert(seqFill.join(lastSeq, "shard")
      .filter($"seq" < $"last" && $"fill" =!= budget).count() === 0)

    // assignment is layout-independent: a repartitioned, reversed input
    // packs identically (pure function of ids + token counts)
    val shuffled = Packing.packSequences(
      docs.repartition(7).sortWithinPartitions($"doc_id".desc),
      "doc_id", nTok, budget, nShards = 4)
    assert(packed.exceptAll(shuffled).count() === 0)
    assert(shuffled.exceptAll(packed).count() === 0)
  }

  test("Packing.shardBalanced: exact snake assignment, balanced totals, layout-independent") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 97L).map(i => (i, Seq.fill(1 + rnd.nextInt(50))("w")
      .mkString(" "))).toDF("doc_id", "text")
    val n = 8
    val got = Packing.shardBalanced(docs, "doc_id",
        TextOps.tokenCount($"text"), n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // literal snake reference
    val ref = got.map(t => (t._1, t._2)).sortBy { case (id, tk) => (-tk, id) }
      .zipWithIndex.map { case ((id, tk), r0) =>
        val pos = r0 % n
        (id, tk, if ((r0 / n) % 2 == 0) pos.toLong else (n - 1 - pos).toLong)
      }
    assert(got.sortBy(_._1).toSeq === ref.sortBy(_._1).toSeq)

    // balance: shard totals within 2× the largest document of each other
    val totals = got.groupBy(_._3).map(_._2.map(_._2).sum)
    val maxDoc = got.map(_._2).max
    assert(totals.max - totals.min <= 2 * maxDoc,
      s"totals=$totals maxDoc=$maxDoc")

    // layout independence
    val again = Packing.shardBalanced(
        docs.repartition(5).sortWithinPartitions($"doc_id".desc),
        "doc_id", TextOps.tokenCount($"text"), n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
  }

  test("scoreBuckets: best-first quantiles per group, deterministic ties, k=1 degenerate") {
    val df = (1L to 9L).map(i => (i, if (i <= 6) "a" else "b", i * 10L))
      .toDF("id", "grp", "s")
    val m = graft.llm.Selection.scoreBuckets(df, "id", col("s"), "grp")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(4)))
      .toMap
    // group a (ids 1..6, score asc with id): best two (6, 5) are head
    assert(m(6L) === ((1L, "head")) && m(5L) === ((1L, "head")))
    assert(m(1L) === ((3L, "tail")) && m(2L) === ((3L, "tail")))
    assert(m(3L)._2 === "middle" && m(4L)._2 === "middle")
    // group b has 3 rows: one per tercile
    assert(m(9L)._2 === "head" && m(8L)._2 === "middle" && m(7L)._2 === "tail")
    // k = 1: everything head
    val k1 = graft.llm.Selection.scoreBuckets(df, "id", col("s"), "grp", 1)
      .collect().map(_.getString(4)).toSet
    assert(k1 === Set("head"))
    // reserved collision fails loudly
    val e = intercept[IllegalArgumentException] {
      graft.llm.Selection.scoreBuckets(
        df.withColumnRenamed("s", "qtile"), "id", col("qtile"), "grp")
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("decontaminationReport: per-item doc/span counts, boilerplate capped, self excluded") {
    val span = (1 to 6).map(j => s"s$j").mkString(" ") // a 6-token span
    val boiler = (1 to 6).map(j => s"b$j").mkString(" ")
    val corpus = Seq(
      (1L, s"$span ua ub uc"), // shares `span` with heldout 100
      (2L, s"ud ue $span"), // also shares `span`
      (3L, s"$boiler va vb"), // boilerplate holder
      (4L, s"$boiler vc vd"),
      (5L, s"$boiler ve vf"),
      (6L, "nothing shared at all here"),
      (100L, s"$span wa wb"), // the heldout doc itself, in the corpus
      (101L, s"$boiler xa xb")).toDF("doc_id", "text")
    val heldout = corpus.filter(col("doc_id") >= 100L)
    val got = Dedup.decontaminationReport(corpus, heldout, "doc_id", "text",
        spanTokens = 6, maxDocsPerSpan = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // heldout 100: span `span` (df 3 ≤ cap) hits docs 1 and 2 — NOT
    // itself; its unique spans hit nothing
    assert(got(100L)._1 === 2L, s"got $got")
    assert(got(100L)._2 >= 1L && got(100L)._3 === 0L)
    // heldout 101: `boiler` has df 4 > cap → excluded, reported as boiler
    assert(got(101L)._1 === 0L && got(101L)._3 >= 1L, s"got $got")
  }

  test("lengthBucketBatches: batchmates share a bucket, batches fill, padding bounded") {
    val rnd = new scala.util.Random(23)
    val docs = (1L to 300L).map(i => (i, Seq.fill(1 + rnd.nextInt(200))("w")
      .mkString(" "))).toDF("doc_id", "text")
    val got = Packing.lengthBucketBatches(docs, "doc_id",
        TextOps.tokenCount($"text"), batchSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.length === 300)
    // bucket is the exact bit length - 1
    got.foreach { case (_, n, b, _) =>
      assert(b === (63 - java.lang.Long.numberOfLeadingZeros(n)).toLong) }
    got.groupBy(t => (t._3, t._4)).foreach { case ((b, _), batch) =>
      assert(batch.length <= 16)
      // padding bound: batchmates within the bucket's 2× spread
      val lens = batch.map(_._2)
      assert(lens.max < 2 * lens.min + 2, s"bucket $b spread $lens")
    }
    // batches within a bucket fill to batchSize except the last
    got.groupBy(_._3).foreach { case (b, rows) =>
      val sizes = rows.groupBy(_._4).toSeq.sortBy(_._1).map(_._2.length)
      assert(sizes.init.forall(_ === 16), s"bucket $b sizes $sizes")
    }
    // layout independence
    val again = Packing.lengthBucketBatches(docs.repartition(9), "doc_id",
        TextOps.tokenCount($"text"), batchSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again === got.map(t => (t._1, t._4)).toSet)
  }

  test("spanCorrupt: reconstruction, span structure, determinism, mask density") {
    val docs = Tables(spark, sf0001).documents.limit(200)
    val out = TextOps.spanCorrupt(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSeq
    assert(out.nonEmpty)
    val sentinel = "<extra_id_(\\d+)>".r
    out.foreach { case (id, nTok, nSpans, in, tgt) =>
      // sentinel sequences count 0..n_spans-1 in order, in both sides
      val inKs = sentinel.findAllMatchIn(in).map(_.group(1).toInt).toSeq
      val tgtKs = sentinel.findAllMatchIn(tgt).map(_.group(1).toInt).toSeq
      assert(inKs === (0 until nSpans.toInt) && tgtKs === inKs, s"doc $id")
      // RECONSTRUCTION: splicing each target span back over its sentinel
      // must reproduce the original token stream exactly
      val spans = tgt.split("<extra_id_\\d+> ").filter(_.nonEmpty)
        .map(_.trim)
      val rebuilt = sentinel.replaceAllIn(in,
        m => java.util.regex.Matcher.quoteReplacement(
          spans(m.group(1).toInt)))
      val orig = docs.filter(col("doc_id") === id)
        .select(col("text")).collect()(0).getString(0)
      assert(rebuilt.split("\\s+").toSeq ===
        orig.trim.split("\\s+").toSeq, s"doc $id")
      assert(nTok === orig.trim.split("\\s+").length.toLong)
    }
    // aggregate mask density ~15% (hash-uniform; loose bounds)
    val masked = out.map { case (_, nTok, _, in, _) =>
      nTok - sentinel.replaceAllIn(in, "").trim.split("\\s+")
        .count(_.nonEmpty).toLong
    }.sum.toDouble
    val total = out.map(_._2).sum.toDouble
    assert(masked / total > 0.10 && masked / total < 0.20,
      s"mask density ${masked / total}")
    // pure function of (id, pos): layout never changes the pairs
    val again = TextOps.spanCorrupt(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(3), r.getString(4)))
      .toSet
    assert(again === out.map(t => (t._1, t._4, t._5)).toSet)
  }

  test("Selection: histogram-pruned picks equal plain-window picks, incl. degenerate scores") {
    import org.apache.spark.sql.expressions.Window
    // group a: smooth score spread; group b: ALL MASS ON ONE SCORE (the
    // worst case for pruning — boundary cell is the whole group); group c:
    // tiny (target rounds to 0 rows for the fraction op)
    val rows = (1 to 200).map(i => (i.toLong, "a", (i % 97) / 96.0, 5L + i % 7)) ++
      (201 to 300).map(i => (i.toLong, "b", 0.5, 10L)) ++
      Seq((301L, "c", 0.9, 3L))
    val df = rows.toDF("doc_id", "lang", "score", "ntok")

    val fracGot = Selection.topFractionByScore(df, "lang", $"score", "doc_id", 3, 4)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    val w = Window.partitionBy($"lang").orderBy($"score".desc, $"doc_id".asc)
    val counts = df.groupBy($"lang").agg(count(lit(1)).as("n"))
    val fracWant = df.join(counts, "lang")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= $"n" * 3 / 4)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(fracGot.toSeq === fracWant.toSeq)

    // non-string and NULL group values are legitimate (grouped on their
    // string form; NULL is its own group) — and a NULL score fails loudly
    val typed = Seq((1L, Some(10), 0.9), (2L, Some(10), 0.1),
      (3L, None, 0.9), (4L, None, 0.1)).toDF("doc_id", "grp", "score")
    val keptTyped = Selection.topFractionByScore(typed, "grp", $"score",
      "doc_id", 1, 2).select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(keptTyped.toSeq === Seq(1L, 3L))
    val nullScore = Seq((1L, "g", Some(0.5)), (2L, "g", None))
      .toDF("doc_id", "grp", "score")
    val ex = intercept[IllegalArgumentException] {
      Selection.topFractionByScore(nullScore, "grp", $"score", "doc_id", 1, 2)
    }
    assert(ex.getMessage.contains("NULL"))

    val budGot = Selection.tokenBudgetByScore(df, "lang", $"score", $"ntok",
      "doc_id", budget = 400L)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    val cumW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budWant = df.withColumn("cum", sum($"ntok").over(cumW))
      .filter($"cum" <= 400L)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(budGot.toSeq === budWant.toSeq)
    assert(budGot.nonEmpty && budGot.length < rows.length) // budget actually binds
  }

  test("distributed Lloyd training is deterministic and layout-independent") {
    // 64 cells × 39 rows/cell > the 128-row driver budget → the trainer
    // must take the treeAggregate path; fixed-point integer accumulation
    // makes the centroids (hence the top-k output) bit-identical under any
    // partitioning of the corpus
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 600).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(queries, c, k = 5, nCells = 64,
        trainSampleSize = 128)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
    val base = run(corpus)
    val shuffled = run(corpus.repartition(7))
    assert(base.nonEmpty)
    assert(base.toSeq === shuffled.toSeq)
  }

  test("semDedup drops planted scaled duplicates, keeps min-id originals") {
    // 40 well-separated base vectors (one-hot-ish in 16 dims) + scaled
    // copies (×1.1, ids +1000): copies normalize to identical unit vectors
    // → same cluster, cosine 1 → dropped; every original survives
    val base = (0 until 40).map { i =>
      val v = Array.fill(16)(0.01 * ((i * 7 + 3) % 5))
      v(i % 16) = 1.0; v((i * 3 + 1) % 16) += 0.5 * (i % 3)
      (i.toLong, v.toSeq)
    }
    val dups = base.map { case (id, v) => (id + 1000L, v.map(_ * 1.1)) }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(df, threshold = 0.99, nClusters = 8,
      trainIters = 4)
      .select($"vec_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === (0L until 40L))
  }

  test("split_leakage_free: no near-dup pair straddles splits; chunks tile docs") {
    val split = graft.SparkEntry.queries("split_leakage_free")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.queries.LlmOps.queries("dedup_minhash")(spark, sf0001)
      .select($"id_a", $"id_b").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(split(r.getLong(0)) === split(r.getLong(1)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) straddles splits")
    }

    // chunking: consecutive chunks overlap by chunk - stride tokens
    val chunks = Tables(spark, sf0001).documents.limit(5)
      .select($"doc_id", posexplode(TextOps.slidingChunks($"text", 32, 16)))
      .collect().groupBy(_.getLong(0))
    chunks.values.foreach { rows =>
      val byIdx = rows.sortBy(_.getInt(1)).map(_.getString(2).split(" ").toSeq)
      byIdx.sliding(2).filter(_.length == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a.drop(16) === b.take(a.length - 16))
      }
    }
  }

  test("dropIfInReference equals a plain anti-join at any fpp (bloom is prune-only)") {
    val corpus = ((1 to 60).map(i => i.toLong -> s"doc number $i body") ++
      Seq(1001L -> "doc number 7 body", 1002L -> "doc number 8 body"))
      .toDF("doc_id", "text")
    val ref = Seq("doc number 7 body", "doc number 8 body", "not in corpus")
      .toDF("text")
    val expected = corpus.join(ref, Seq("text"), "left_anti")
      .select($"doc_id").collect().map(_.getLong(0)).sorted

    // generous fpp AND a deliberately undersized bloom (forces false
    // positives through the pre-filter): the md5 confirm join must scrub
    // every one of them — output identical to the exact anti-join
    for ((n, fpp) <- Seq((4L, 0.5), (1L << 16, 0.001))) {
      val got = Dedup.dropIfInReference(corpus, ref, "doc_id", "text",
        expectedRefDocs = n, fpp = fpp)
        .select($"doc_id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq === expected.toSeq, s"(expected=$n fpp=$fpp)")
    }
  }

  test("hardNegatives excludes same-label vectors and caps similarity") {
    // label 0: query + an identical twin (sim 1.0) + a near twin;
    // label 1: a near match (the hard negative) + an orthogonal vector
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0), 0),
      (2L, Seq(1.0, 0.0, 0.0), 0), // same label — never a negative
      (3L, Seq(0.9, 0.1, 0.0), 0), // same label
      (4L, Seq(0.9, 0.2, 0.0), 1), // hard negative
      (5L, Seq(0.0, 0.0, 1.0), 1), // easy negative
      (6L, Seq(1.0, 0.0, 0.0), 1) // identical but other label: sim 1.0 > cap
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
      vecs.filter($"vec_id" === 1), vecs, k = 5, maxSim = 0.99)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    // ranked: 4 first (hardest), then 5; 2/3 same-label excluded; 6 capped
    assert(out.toSeq === Seq((4L, 1L), (5L, 2L)))
  }

  test("curriculum interleave honors weights in every schedule prefix") {
    val df = ((1 to 40).map(i => (i.toLong, "a")) ++
      (101 to 120).map(i => (i.toLong, "b"))).toDF("doc_id", "grp")
    val sched = Curriculum.interleave(df, "grp", "doc_id",
      Map("a" -> 2L, "b" -> 1L))
      .orderBy("schedule_pos").collect().map(_.getString(1))
    assert(sched.length === 60)
    // stride property: every prefix carries groups near their 2:1 weights
    for (p <- Seq(6, 15, 30, 60)) {
      val a = sched.take(p).count(_ == "a")
      assert(math.abs(a - p * 2.0 / 3) <= 2,
        s"prefix $p has $a 'a' docs, want ~${p * 2 / 3}")
    }
    // within a group, docs appear in id order
    val aOrder = Curriculum.interleave(df, "grp", "doc_id",
      Map("a" -> 2L, "b" -> 1L))
      .filter($"grp" === "a").orderBy("schedule_pos")
      .collect().map(_.getLong(0))
    assert(aOrder.toSeq === aOrder.sorted.toSeq)
  }

  test("curriculum interleave fails loudly on a missing group weight") {
    val df = Seq((1L, "a"), (2L, "zz")).toDF("doc_id", "grp")
    val e = intercept[Exception] {
      Curriculum.interleave(df, "grp", "doc_id", Map("a" -> 1L)).collect()
    }
    assert(e.getMessage.contains("no weight for group"))
  }

  test("globalSortRank equals a single-partition sort rank, at any key") {
    import graft.etl.Transforms
    val df = (1 to 500).map(i => (i.toLong, (i * 37) % 101))
      .toDF("id", "key").repartition(13)
    val got = Transforms.globalSortRank(df,
        Seq($"key".asc, $"id".asc), "pos")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val want = df.collect().map(r => (r.getLong(0), r.getInt(1)))
      .sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got === want)
  }

  test("stripHtml strips tags, unescapes once, collapses whitespace") {
    val df = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "a &amp;amp; b &lt;tag&gt;"), // double-escaped decodes ONE level
      (3L, "no  markup   here")
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextOps.stripHtml($"text").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "hello world")
    assert(out(2L) === "a &amp; b <tag>")
    assert(out(3L) === "no markup here")
  }

  test("canonicalizeUrl collapses case/port/fragment/query-order variants") {
    val urls = Seq(
      (1L, "HTTPS://Example.COM:443/Item/9?b=2&a=1&#frag"),
      (2L, "https://example.com/Item/9?a=1&b=2"),
      (3L, "http://EXAMPLE.com:80//x?z=9"),
      (4L, "https://example.com"),
      (5L, "https://example.com:8443/x"),  // non-default port survives
      (6L, "not a url"),
      (7L, "ftp://Host/File")
    ).toDF("id", "url")
    val got = urls.select($"id", TextOps.canonicalizeUrl($"url").as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === Some("https://example.com/Item/9?a=1&b=2"))
    assert(got(1L) === got(2L)) // the whole point: variants collapse
    assert(got(3L) === Some("http://example.com//x?z=9"))
    assert(got(4L) === Some("https://example.com/"))
    assert(got(5L) === Some("https://example.com:8443/x"))
    assert(got(6L) === None)
    assert(got(7L) === Some("ftp://host/File"))
  }

  test("semanticContamination flags planted near-copies of eval vectors") {
    val evalSet = Seq((1000L, Array(1.0, 0.0, 0.0)), (2000L, Array(0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0.99, 0.01, 0.0)),  // near-copy of eval 1000
      (2L, Array(0.0, 0.0, 1.0)),    // orthogonal to both
      (3L, Array(0.0, 1.02, 0.01))   // scaled near-copy of eval 2000
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticContamination(corpus, evalSet, 0.95)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(got(1L) === ((1000L, true)))
    assert(got(2L)._2 === false)
    assert(got(3L) === ((2000L, true)))
    // layout independence of the argmax
    val re = Similarity.semanticContamination(corpus.repartition(5), evalSet,
      0.95).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === got.map { case (k, v) => k -> v._1 })
  }

  test("weightedSampleK: replays the ES priority reference and ignores partitioning") {
    val rows = (1L to 60L).map(i => ("g", i, 1L + i % 7)).toDF("g", "id", "w")
    def sample(df: org.apache.spark.sql.DataFrame) =
      Selection.weightedSampleK(df, "g", "id", $"w", k = 8)
        .select($"id", $"priority_micro", $"sel_rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = sample(rows)
    assert(got === sample(rows.repartition(11)))
    assert(got.size === 8)
    // sequential reference: same md5 uniform, PortableMath.microLnRef ln,
    // same all-positive floor division and (priority, id) order
    val ref = (1L to 60L).map { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s":$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 10)
      val a = java.lang.Long.parseLong(hex, 16) + 1L
      val nll = -graft.functions.PortableMath.microLnRef(a, 1L << 40)
      (i, nll * 1000000L / (1L + i % 7))
    }.sortBy { case (id, p) => (p, id) }.take(8).zipWithIndex
      .map { case ((id, p), r) => (id, p, r + 1L) }.toSet
    assert(got === ref)
  }

  test("weightedSampleK: weights bias the sample; zero weights excluded; salts independent") {
    // one heavy item among 200 light ones: weight 10000 vs 1 → the heavy
    // id must be sampled (P(miss) < (1 - 10000/10200)^5 ≈ 1e-8 under ES;
    // deterministic here, so this asserts the implementation direction)
    val df = ((1L to 200L).map(i => ("g", i, 1L)) :+ (("g", 999L, 10000L)))
      .toDF("g", "id", "w")
    val ids = Selection.weightedSampleK(df, "g", "id", $"w", k = 5)
      .select($"id").as[Long].collect().toSet
    assert(ids.contains(999L))
    // zero/negative weights can never be selected
    val z = Selection.weightedSampleK(
      Seq(("g", 1L, 0L), ("g", 2L, -3L), ("g", 3L, 5L)).toDF("g", "id", "w"),
      "g", "id", $"w", k = 3).select($"id").as[Long].collect().toSeq
    assert(z === Seq(3L))
    // a different salt draws a different (here: provably different) sample
    val s1 = Selection.weightedSampleK(df, "g", "id", $"w", k = 5, salt = "a")
      .select($"id").as[Long].collect().toSet
    val s2 = Selection.weightedSampleK(df, "g", "id", $"w", k = 5, salt = "b")
      .select($"id").as[Long].collect().toSet
    assert(s1 !== s2)
  }
}
