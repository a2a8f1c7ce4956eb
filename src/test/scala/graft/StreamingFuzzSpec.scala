package graft

import graft.jobs.{InMemoryStore, JobState}
import graft.llm.CorpusStats
import graft.streaming.Pipelines
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object StreamingFuzzSpec {
  /** ndjson string escaping for the declared-config file drops. */
  private[graft] def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
}

/** Seeded fuzz over the indexed-ingest streaming loops (r10 VERDICT ask
  * #6): random corpora with planted repetition, random batch split points,
  * random compaction cadence, and random CHAINS of cleaner ops (stage N+1
  * streams stage N's per-batch cleaned output) must satisfy, at every
  * stage, the loop's documented invariant — the persisted two-level index
  * resolves to the batch index over that stage's input union, and for the
  * keep-one substring loop the streamed OUTPUT additionally equals the
  * batch operator over the union. The hand-written per-op StreamingSpec
  * cases pin one split each; this sweeps the space where cross-batch
  * state bugs hide: compaction boundaries (compactEvery down to 1),
  * deltas racing bases, empty batches, and chained id contracts.
  */
class StreamingFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val SpanL = 4   // boilerplate span length
  private val SpanDf = 2  // boilerplate df cut
  private val SubL = 5    // substring keep-one run length
  private val ParaDf = 2  // paragraph df cut

  /** One streaming loop under test: how to start it, how to read its
    * persisted index, the batch builder the index must equal over the
    * input union, and (exact ops only) the batch operator the streamed
    * OUTPUT must equal. `chains` marks ops whose (id, clean_text) output
    * can feed a next stage.
    */
  /** The stage's declared-config twin (r14 — the completed declared
    * ingest-loop family joins the fuzz pool): op name, expr builder from
    * the compaction cadence, and the ndjson line/schema shape (the dsir
    * stage carries its is_tgt flag IN the file — the declared surface
    * has no pre-transform hook, and the flag is a pure function of the
    * id either way).
    */
  private case class DeclaredForm(op: String, expr: Int => String,
      cols: Seq[String] = Seq("doc_id", "text"),
      schema: String = "doc_id LONG, text STRING",
      line: (Long, String) => String = (id, t) =>
        s"""{"doc_id":$id,"text":"${StreamingFuzzSpec.esc(t)}"}""",
      // model-table path (e.g. the frozen semdedup centroids) relative
      // to the stage's base dir, written by Stage.prepare
      nameOf: String => Option[String] = _ => None)

  private case class Stage(
      name: String,
      start: (DataFrame, String, Int) =>
        org.apache.spark.sql.streaming.StreamingQuery,
      indexRead: String => DataFrame,
      indexBatch: DataFrame => DataFrame,
      outputBatch: Option[DataFrame => DataFrame],
      chains: Boolean,
      declared: Option[DeclaredForm] = None,
      // one-time per-run fixture setup under the base dir (frozen model
      // tables shared by BOTH driving modes)
      prepare: String => Unit = _ => (),
      // op-specific invariant over (state base dir, input union) — the
      // dsir stage's retro-score ≡ batch-operator equality rides here
      extraCheck: (String, DataFrame) => Unit = (_, _) => ())

  // semdedup fuzz embeddings: 4 direction families keyed by id, scaled
  // copies within a family (amax-relative int8 quantization maps them to
  // IDENTICAL codes → real dups to drop). The Scala and Column forms
  // compute bit-identical doubles (same Math.sin/×/+ in the same order),
  // so the declared ndjson drop feeds the engine the exact vectors the
  // direct MemoryStream path computes.
  private def fuzzEmb(id: Long): Seq[Double] = {
    val fam = (id % 4).toDouble
    val scale = 1.0 + 0.07 * (id / 4).toDouble
    (0 until 8).map(j => (math.sin(fam + j * 0.7) + 2.0) * scale)
  }
  private def fuzzEmbCol: org.apache.spark.sql.Column = {
    val fam = pmod(col("doc_id"), lit(4)).cast("double")
    val scale = lit(1.0) + lit(0.07) * floor(col("doc_id") / lit(4))
    array((0 until 8).map(j =>
      (sin(fam + lit(j * 0.7)) + lit(2.0)) * scale): _*)
  }
  private def fuzzLang(id: Long): String = Seq("en", "fr", "de")((id % 3).toInt)
  private def fuzzLangCol: org.apache.spark.sql.Column =
    element_at(array(lit("en"), lit("fr"), lit("de")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
  private def writeFuzzCents(base: String): Unit = {
    def qz(v: Seq[Double]): Seq[Int] = {
      val amax = v.map(math.abs).max
      v.map(x => math.floor(x * 127 / amax + 0.5).toInt)
    }
    (0 until 4).map(f =>
        (f, qz((0 until 8).map(j => math.sin(f + j * 0.7) + 2.0))))
      .toDF("cid", "q")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/cents")
  }

  private lazy val stages: Seq[Stage] = Seq(
    Stage("boilerplate",
      (s, b, ce) => Pipelines.boilerplateIngest(s, "doc_id", "text",
        s"$b/out", s"$b/idx", s"$b/ckpt", SpanL, SpanDf, ce),
      b => Pipelines.readSpanDfIndex(spark, s"$b/idx"),
      u => CorpusStats.spanDfIndex(u, "doc_id", "text", SpanL),
      None, chains = true,
      declared = Some(DeclaredForm("boilerplate_ingest",
        ce => s"$SpanL,$SpanDf,$ce"))),
    Stage("substring",
      (s, b, ce) => Pipelines.substringDedupIngest(s, "doc_id", "text",
        s"$b/out", s"$b/idx", s"$b/ckpt", SubL, ce),
      b => Pipelines.readSubstrIndex(spark, s"$b/idx"),
      u => CorpusStats.substrKeeperIndex(u, "doc_id", "text", SubL),
      Some(u => CorpusStats.removeDuplicateSubstrings(u, "doc_id", "text",
        SubL)),
      chains = true,
      declared = Some(DeclaredForm("substring_dedup_ingest",
        ce => s"$SubL,$ce"))),
    Stage("para",
      (s, b, ce) => Pipelines.paraDedupIngest(s, "doc_id", "text",
        s"$b/out", s"$b/idx", s"$b/ckpt", ParaDf, ce),
      b => Pipelines.readParaDfIndex(spark, s"$b/idx"),
      u => CorpusStats.paraDfIndex(u, "doc_id", "text"),
      None, chains = true,
      declared = Some(DeclaredForm("para_dedup_ingest",
        ce => s"$ParaDf,$ce"))),
    Stage("tfidf",
      (s, b, ce) => Pipelines.tfidfIngest(s, "doc_id", "text",
        s"$b/out", s"$b/idx", s"$b/ckpt", 3, ce),
      b => Pipelines.readTermDfIndex(spark, s"$b/idx"),
      u => CorpusStats.termDfIndex(u, "doc_id", "text"),
      None, chains = false,
      declared = Some(DeclaredForm("tfidf_ingest", ce => s"3,$ce"))),
    Stage("dsir",
      // target flag derived from the id (doc 0 is always present as a
      // chain head, so the target side is never empty)
      (s, b, ce) => Pipelines.dsirSelfIngest(
        s.withColumn("is_tgt", pmod(col("doc_id"), lit(5)) === 0),
        "doc_id", "text", "is_tgt",
        s"$b/out", s"$b/idx", s"$b/ckpt", ce),
      b => Pipelines.readDsirDist(spark, s"$b/idx"),
      u => {
        import graft.llm.Dsir
        val f = Dsir.hashedFeatures(u, "doc_id", "text")
        val raw = Dsir.featureDist(f).withColumnRenamed("cnt", "cr")
        val tgt = Dsir.featureDist(f.join(
            u.filter(pmod(col("doc_id"), lit(5)) === 0).select("doc_id"),
            Seq("doc_id"), "left_semi"))
          .withColumnRenamed("cnt", "ct")
        raw.join(tgt, Seq("bkt"), "left")
          .select(col("bkt"), col("cr"),
            coalesce(col("ct"), lit(0L)).as("ct"))
      },
      None, chains = false,
      declared = Some(DeclaredForm("dsir_self_ingest", ce => s"$ce",
        cols = Seq("doc_id", "text", "is_tgt"),
        schema = "doc_id LONG, text STRING, is_tgt BOOLEAN",
        line = (id, t) => s"""{"doc_id":$id,"text":"${StreamingFuzzSpec
          .esc(t)}","is_tgt":${id % 5 == 0}}""")),
      extraCheck = (b, u) => {
        import graft.llm.Dsir
        val got = Pipelines.dsirRetroScore(spark, s"$b/out", s"$b/idx")
          .collect().map(_.toSeq).toSet
        val expect = Dsir.importanceWeights(
            u.withColumn("is_tgt", pmod(col("doc_id"), lit(5)) === 0),
            "doc_id", "text", col("is_tgt"))
          .collect().map(_.toSeq).toSet
        assert(got === expect,
          "dsir: retro-score != batch operator over the union")
      }),
    Stage("datacard",
      // language derived from the id (same function in both drive modes)
      (s, b, ce) => Pipelines.datacardIngest(
        s.withColumn("lang", fuzzLangCol),
        "doc_id", "text", "lang", s"$b/out", s"$b/idx", s"$b/ckpt", ce),
      b => Pipelines.readLtfIndex(spark, s"$b/idx"),
      u => CorpusStats.langTokenFreqs(
        u.withColumn("lang", fuzzLangCol), "text", "lang"),
      None, chains = false,
      declared = Some(DeclaredForm("datacard_ingest", ce => s"$ce",
        cols = Seq("doc_id", "text", "lang"),
        schema = "doc_id LONG, text STRING, lang STRING",
        line = (id, t) => s"""{"doc_id":$id,"text":"${StreamingFuzzSpec
          .esc(t)}","lang":"${fuzzLang(id)}"}""")),
      extraCheck = (b, u) => {
        // the assembled panel over merged slim state is bit-identical
        // to the batch panel over the union — the loop's full contract
        val ul = u.withColumn("lang", fuzzLangCol)
        val got = Pipelines.datacardRead(spark, s"$b/out", s"$b/idx")
          .collect().map(_.toSeq).toSet
        val expect = CorpusStats.datacardPanel(
            CorpusStats.datacardDocStats(ul, "doc_id", "text", "lang"),
            CorpusStats.langTokenFreqs(ul, "text", "lang"))
          .collect().map(_.toSeq).toSet
        assert(got === expect,
          "datacard: streamed panel != batch panel over the union")
      }),
    Stage("semdedup",
      // embeddings derived from the id, FROZEN centroid table written by
      // prepare — the family-scaled copies quantize to identical codes
      (s, b, ce) => Pipelines.semDedupIngest(
        s.withColumn("emb", fuzzEmbCol).drop("text"),
        "doc_id", "emb", spark.read.parquet(s"$b/cents"), 0.99,
        s"$b/out", s"$b/idx", s"$b/ckpt", compactEvery = ce),
      b => Pipelines.readSemDedupState(spark, s"$b/idx").select(col("id")),
      // the state carries EVERY ingested vector, one row per id
      u => u.select(col("doc_id").as("id")),
      None, chains = false,
      declared = Some(DeclaredForm("semdedup_ingest",
        ce => s"0.99,10000,$ce",
        cols = Seq("doc_id", "emb"),
        schema = "doc_id LONG, emb ARRAY<DOUBLE>",
        line = (id, _) => s"""{"doc_id":$id,"emb":[${fuzzEmb(id)
          .mkString(",")}]}""",
        nameOf = b => Some(s"$b/cents"))),
      prepare = writeFuzzCents,
      extraCheck = (b, u) => {
        // streamed survivors ≡ semDedupFrozen over the union (the loop's
        // documented batch equivalence under a frozen table)
        val got = spark.read.parquet(s"$b/out")
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet
        val expect = graft.llm.Similarity.semDedupFrozen(
            u.withColumn("emb", fuzzEmbCol),
            spark.read.parquet(s"$b/cents"), 0.99,
            idCol = "doc_id", vecCol = "emb")
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet
        assert(got === expect,
          "semdedup: streamed survivors != semDedupFrozen over the union")
      }),
    Stage("bitext",
      // one language side's state loop (r17): embeddings derived from
      // the id (same function in both drive modes), FROZEN 4x4 width
      (s, b, ce) => Pipelines.bitextIngest(
        s.withColumn("emb", fuzzEmbCol).drop("text"),
        "doc_id", "emb", s"$b/out", s"$b/idx", s"$b/ckpt",
        tables = 4, bits = 4, compactEvery = ce),
      b => Pipelines.readBitextSide(spark, s"$b/out", s"$b/idx")._2,
      // the resolved index rows must equal a batch hashing of the union
      // at the frozen width — per-row determinism is the whole contract
      u => graft.llm.Similarity.lshStateFromQ8(
        graft.llm.Similarity.q8State(
          u.withColumn("emb", fuzzEmbCol), "doc_id", "emb"), 4, 4),
      None, chains = false,
      declared = Some(DeclaredForm("bitext_ingest", ce => s"4,4,$ce",
        cols = Seq("doc_id", "emb"),
        schema = "doc_id LONG, emb ARRAY<DOUBLE>",
        line = (id, _) => s"""{"doc_id":$id,"emb":[${fuzzEmb(id)
          .mkString(",")}]}""")),
      extraCheck = (b, u) => {
        val ul = u.withColumn("emb", fuzzEmbCol).select("doc_id", "emb")
        // resolved vecs state ≡ batch quantization over the union
        val (v, _) = Pipelines.readBitextSide(spark, s"$b/out", s"$b/idx")
        assert(img(v) === img(graft.llm.Similarity.q8State(
            ul, "doc_id", "emb")),
          "bitext: merged vecs state != batch quantization over the union")
        // retro-mine against a second side (its own loop, one batch)
        // equals batch candidate-fed mining over the unions — the
        // streamed ≡ batch-EXACT contract under fuzzed splits/cadences
        val tgtRows = (100L to 104L).map(i => (i, fuzzEmb(i + 2)))
        val memT = MemoryStream[(Long, Seq[Double])](spark)
        val qT = Pipelines.bitextIngest(
          memT.toDF().toDF("doc_id", "emb"), "doc_id", "emb",
          s"$b/tout", s"$b/tidx", s"$b/tckpt", tables = 4, bits = 4)
        memT.addData(tgtRows: _*); qT.processAllAvailable(); qT.stop()
        val mined = img(Pipelines.bitextRetroMine(spark,
          s"$b/out", s"$b/idx", s"$b/tout", s"$b/tidx",
          k = 2, bits = 4))
        val tgtDf = tgtRows.toDF("doc_id", "emb")
        val (sl, tl) = graft.llm.Similarity.annTopKBitext(ul, tgtDf,
          k = 2, tables = 4, bits = 4, idCol = "doc_id", vecCol = "emb")
        val batch = img(graft.llm.Retrieval.bitextMineFromCandidates(
          ul, tgtDf, "doc_id", "emb", sl, tl, k = 2,
          marginThresholdMicro = 1000000L))
        assert(mined === batch,
          "bitext: retro-mine != batch mining over the unions")
        assert(mined.nonEmpty,
          "bitext: fuzz fixture inert — family-identical vectors must mine")
      }))

  /** Random corpus with planted cross-doc repetition: whole-paragraph
    * footers (para/boilerplate signal) and a >= SubL-token shared run
    * (substring signal), over random small-vocab bodies.
    */
  private def corpus(rnd: scala.util.Random): Seq[(Long, String)] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val footA = "f1 f2 f3 f4 f5"
    val footB = "g1 g2 g3 g4 g5 g6"
    val n = 12 + rnd.nextInt(10)
    (0 until n).map { i =>
      val body = Seq.fill(3 + rnd.nextInt(8))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val mid = if (rnd.nextInt(3) == 0) s"\n$footA\n" else "\n"
      val tail = if (rnd.nextInt(3) == 0) footB else ""
      (i.toLong, s"$body$mid$tail")
    }
  }

  /** Ordered prefix cuts — the ingest id contract (batch ids increase)
    * must hold, so splits reorder nothing. Empty batches allowed. */
  private def splits(rnd: scala.util.Random, n: Int): Seq[(Int, Int)] = {
    val nb = 2 + rnd.nextInt(3)
    val cuts = (Seq.fill(nb - 1)(rnd.nextInt(n + 1)).sorted :+ n)
    (0 +: cuts).zip(cuts).distinct
  }

  private def img(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** Run one stage over the given per-batch inputs; assert its index
    * (and, if exact, output) invariants; return the streamed per-batch
    * cleaned outputs for chaining (None if the op is terminal).
    * `declared = true` drives the stage through its DECLARED config twin
    * instead of the direct call — one PipelineConfig.run session per
    * batch file (each run drains and stops, so the rotation ALSO fuzzes
    * the cross-session kill-and-resume path under random splits and
    * compaction cadences); the invariants asserted are identical.
    */
  private def runStage(st: Stage, batches0: Seq[Seq[(Long, String)]],
      compactEvery: Int,
      declared: Boolean = false): Option[Seq[Seq[(Long, String)]]] = {
    // an empty slice fires no micro-batch, so it would shift the batch=i
    // partition numbering the chain reads by position — drop empties up
    // front (the random cuts still exercise 1-row and lopsided batches)
    val batches = batches0.filter(_.nonEmpty)
    val base = java.nio.file.Files.createTempDirectory(
      s"graft_fuzz_${st.name}").toString
    st.prepare(base)
    if (declared) {
      val d = st.declared.getOrElse(
        fail(s"${st.name}: declared rotation without a declared form"))
      val in = java.nio.file.Files.createTempDirectory(
        s"graft_fuzz_${st.name}_in")
      val nameField = d.nameOf(base).fold("")(n => s""""name": "$n", """)
      val conf = graft.config.PipelineConfig.parse(
        s"""{ "id": "fz_${st.name}", "name": "${st.name}-fuzz", "steps": [
           |  { "step": "loop", "kind": "ingest",
           |    "source": { "type": "json", "paths": ["$in/*.ndjson"],
           |      "schema": "${d.schema}" },
           |    "transforms": [ { "op": "${d.op}", $nameField
           |      "cols": [${d.cols.map(c => s""""$c"""").mkString(", ")}],
           |      "expr": "${d.expr(compactEvery)}" } ],
           |    "sink": { "type": "parquet", "path": "$base/out",
           |      "options": { "index": "$base/idx",
           |        "checkpoint": "$base/ckpt" } } } ] }""".stripMargin)
      batches.zipWithIndex.foreach { case (b, i) =>
        java.nio.file.Files.write(in.resolve(f"b$i%03d.ndjson"),
          b.map { case (id, t) => d.line(id, t) }
            .mkString("\n").getBytes("UTF-8"))
        assert(graft.config.PipelineConfig
          .run(spark, conf, new InMemoryStore)
          .commands("loop").status === JobState.Complete, st.name)
      }
    } else {
      val mem = MemoryStream[(Long, String)](spark)
      val q = st.start(mem.toDF().toDF("doc_id", "text"), base, compactEvery)
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
      q.stop()
    }
    val union = batches.flatten.toDF("doc_id", "text")
    assert(img(st.indexRead(base)) === img(st.indexBatch(union)),
      s"${st.name}: merged index != batch index over the union")
    st.extraCheck(base, union)
    st.outputBatch.foreach { ob =>
      val streamed = spark.read.parquet(s"$base/out")
        .select("doc_id", "n_tokens", "n_removed", "clean_text")
      assert(img(streamed) === img(ob(union)
        .select("doc_id", "n_tokens", "n_removed", "clean_text")),
        s"${st.name}: streamed output != batch operator over the union")
    }
    if (!st.chains) None
    else Some(batches.indices.map { i =>
      val dir = new java.io.File(s"$base/out/batch=$i")
      if (!dir.exists()) Nil
      else spark.read.parquet(dir.toString)
        .select(col("doc_id"), col("clean_text").as("text"))
        .as[(Long, String)].collect().toSeq.sortBy(_._1)
    })
  }

  test("seeded ingest chains: streamed state equals batch-over-union at " +
      "every stage, across random splits and compaction cadences " +
      "(direct AND declared-config driving)") {
    // declared-rotation coverage ledger: every declarable stage must run
    // through its config twin at least once across the seeds (forced on
    // first encounter, random thereafter), so the whole declared family
    // is fuzz-pool-resident, not just ConfigSpec-pinned
    val declaredDone = scala.collection.mutable.Set[String]()
    def driveDeclared(st: Stage, rnd: scala.util.Random): Boolean =
      st.declared.isDefined &&
        (!declaredDone.contains(st.name) || rnd.nextInt(3) == 0)
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val docs = corpus(rnd)
      val batches = splits(rnd, docs.size).map { case (a, b) =>
        docs.slice(a, b)
      }
      // head op and compaction cadence rotate DETERMINISTICALLY so every
      // loop is a chain head at least twice and every cadence (including
      // compact-every-batch and never-compact) is exercised; corpus,
      // splits and the chain tail stay seeded-random
      val compactEvery = Seq(1, 2, 3, 16)(seed % 4)
      val first = stages(seed % stages.size)
      val firstDeclared = driveDeclared(first, rnd)
      if (firstDeclared) declaredDone += first.name
      info(s"seed $seed: ${docs.size} docs, ${batches.size} batches, " +
        s"compactEvery=$compactEvery, chain head=${first.name}" +
        (if (firstDeclared) " (declared)" else ""))
      val out = runStage(first, batches, compactEvery, firstDeclared)
      // chain a second stage over the streamed per-batch outputs when the
      // head op produces a cleaned corpus
      out.foreach { cleaned =>
        val second = stages(rnd.nextInt(stages.size))
        val secondDeclared = driveDeclared(second, rnd)
        if (secondDeclared) declaredDone += second.name
        info(s"seed $seed: chain tail=${second.name}" +
          (if (secondDeclared) " (declared)" else ""))
        runStage(second, cleaned, compactEvery, secondDeclared)
      }
    }
    val declarable = stages.filter(_.declared.isDefined).map(_.name).toSet
    assert(declaredDone.toSet === declarable,
      s"declared rotation missed: ${declarable -- declaredDone}")
  }

  test("near_dup_ingest fuzz (r14 ask #5): survivors form an independent " +
      "set under the pair predicate, every dropped doc has a batch-time " +
      "witness pair, and the index carries exactly the survivors' bands " +
      "— 8 seeds") {
    // the 8th declared loop has no batch twin to equality-fuzz (greedy
    // first-accepted semantics are order-dependent by design), but its
    // INVARIANTS are order-free and fully checkable from outside:
    //   1. no two surviving docs are near-dups of each other (the batch
    //      minhashNearDups relation over the survivor corpus is empty);
    //   2. every dropped doc appears in a near-dup pair over the docs
    //      visible at its batch time (prior survivors ∪ its own batch) —
    //      nothing vanishes without a witness;
    //   3. the persisted band index is bit-identical to minhashBandIndex
    //      over exactly the surviving docs.
    import graft.llm.Dedup
    import graft.streaming.Pipelines
    // nearDupIngest's own parameter defaults — the invariant relations
    // must be evaluated at the same (shingleN, numHashes, bands, thr)
    val (sh, nh, bd, thr) = (3, 96, 48, 0.5)
    var totalDropped = 0
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
        "eta", "theta")
      // near-dup-prone corpus: ~40% of docs are copies of an earlier doc,
      // half exact, half with one appended token (high-Jaccard near-dup)
      val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      val n = 14 + rnd.nextInt(8)
      (0 until n).foreach { i =>
        val t =
          if (i > 0 && rnd.nextInt(5) < 2) {
            val prev = docs(rnd.nextInt(docs.size))._2
            if (rnd.nextBoolean()) prev
            else prev + " " + vocab(rnd.nextInt(vocab.size))
          } else Seq.fill(6 + rnd.nextInt(8))(
            vocab(rnd.nextInt(vocab.size))).mkString(" ")
        docs += ((i.toLong, t))
      }
      val batches = splits(rnd, docs.size)
        .map { case (a, b) => docs.slice(a, b).toSeq }.filter(_.nonEmpty)
      val base = java.nio.file.Files
        .createTempDirectory("graft_fuzz_ndp").toString
      // every third seed drives the DECLARED config twin instead of the
      // direct call (one PipelineConfig.run session per batch file — the
      // cross-session kill-and-resume path, the runStage idiom), so the
      // 8th loop is fuzz-pool-resident in BOTH forms like the other 7;
      // the invariants asserted below are identical
      val declared = seed % 3 == 0
      if (declared) {
        val in = java.nio.file.Files
          .createTempDirectory("graft_fuzz_ndp_in")
        val conf = graft.config.PipelineConfig.parse(
          s"""{ "id": "fz_ndp_$seed", "name": "ndp-fuzz", "steps": [
             |  { "step": "loop", "kind": "ingest",
             |    "source": { "type": "json", "paths": ["$in/*.ndjson"],
             |      "schema": "doc_id LONG, text STRING" },
             |    "transforms": [ { "op": "near_dup_ingest",
             |      "cols": ["doc_id", "text"],
             |      "expr": "$sh,$nh,$bd,$thr" } ],
             |    "sink": { "type": "parquet", "path": "$base/corpus",
             |      "options": { "index": "$base/idx",
             |        "checkpoint": "$base/ckpt" } } } ] }""".stripMargin)
        batches.zipWithIndex.foreach { case (b, i) =>
          java.nio.file.Files.write(in.resolve(f"b$i%03d.ndjson"),
            b.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
              .mkString("\n").getBytes("UTF-8"))
          assert(graft.config.PipelineConfig
            .run(spark, conf, new InMemoryStore)
            .commands("loop").status === JobState.Complete,
            s"seed $seed declared batch $i")
        }
      } else {
        val mem = MemoryStream[(Long, String)](spark)
        val q = Pipelines.nearDupIngest(mem.toDF().toDF("doc_id", "text"),
          "doc_id", "text", s"$base/corpus", s"$base/idx", s"$base/ckpt",
          sh, nh, bd, thr)
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        q.stop()
      }
      val accepted = spark.read.parquet(s"$base/corpus")
        .select(col("doc_id").cast("long"), col("text"),
          col("batch").cast("long"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val acceptedIds = accepted.map(_._1).toSet
      val survDf = accepted.map(t => (t._1, t._2)).toSeq.toDF("doc_id", "text")
      // 3. index ≡ survivors' bands, bit-exact
      assert(img(spark.read.parquet(s"$base/idx")
          .select("id", "band", "bucket")) ===
        img(Dedup.minhashBandIndex(survDf, "doc_id", "text", sh, nh, bd)),
        s"seed $seed: index != survivors' bands")
      // 1. independence: the pair relation over survivors alone is empty
      assert(Dedup.minhashNearDups(survDf, "doc_id", "text",
          sh, nh, bd, thr).count() === 0L,
        s"seed $seed: two survivors are near-dups of each other")
      // 2. witness: every dropped doc pairs with something visible at
      // its batch time (prior survivors ∪ its own batch)
      batches.zipWithIndex.foreach { case (b, i) =>
        val dropped = b.map(_._1).filterNot(acceptedIds)
        totalDropped += dropped.size
        if (dropped.nonEmpty) {
          val ctx = (accepted.filter(_._3 < i).map(t => (t._1, t._2))
            ++ b).toSeq.toDF("doc_id", "text")
          val paired = Dedup.minhashNearDups(ctx, "doc_id", "text",
              sh, nh, bd, thr)
            .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
          dropped.foreach(d => assert(paired(d),
            s"seed $seed batch $i: doc $d dropped without a witness pair"))
        }
      }
    }
    assert(totalDropped > 0, "fixture drift: fuzz corpora produced no drops")
  }

  test("near_dup forget-then-ingest fuzz (r15 ask #4): recompute over " +
      "survivors keeps every loop invariant across a forget, forgotten " +
      "docs stop shadowing, displaced docs stay dropped — 6 seeds") {
    import graft.llm.Dedup
    import org.apache.spark.sql.types.{LongType, StringType, StructField,
      StructType}
    val (sh, nh, bd, thr) = (3, 96, 48, 0.5)
    var contDropped = 0
    var reaccepted = 0
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 48611)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
        "eta", "theta")
      def freshText() = Seq.fill(6 + rnd.nextInt(8))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      val n = 10 + rnd.nextInt(6)
      (0 until n).foreach { i =>
        val t =
          if (i > 0 && rnd.nextInt(5) < 2) docs(rnd.nextInt(docs.size))._2
          else freshText()
        docs += ((i.toLong, t))
      }
      val in = java.nio.file.Files.createTempDirectory("graft_fndr_in")
      val base = java.nio.file.Files
        .createTempDirectory("graft_fndr").toString
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType)))
      def runBatch(name: String, rows: Seq[(Long, String)]): Unit = {
        java.nio.file.Files.write(in.resolve(name),
          rows.map { case (id, t) =>
            s"""{"doc_id":$id,"text":"${StreamingFuzzSpec.esc(t)}"}""" }
            .mkString("\n").getBytes("UTF-8"))
        val q = Pipelines.nearDupIngest(
          spark.readStream.schema(schema).json(in.toString + "/*.ndjson"),
          "doc_id", "text", s"$base/corpus", s"$base/idx", s"$base/ckpt",
          sh, nh, bd, thr)
        q.processAllAvailable(); q.stop()
      }
      splits(rnd, docs.size).map { case (a, b) => docs.slice(a, b).toSeq }
        .filter(_.nonEmpty).zipWithIndex
        .foreach { case (b, i) => runBatch(f"b$i%03d.ndjson", b) }
      def corpus() = spark.read.parquet(s"$base/corpus")
        .select($"doc_id".cast("long"), $"text", $"batch".cast("long"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val accepted1 = corpus()
      // forget a random non-empty survivor subset, rebuild from survivors
      val forgotten = accepted1.map(_._1)
        .filter(_ => rnd.nextBoolean()) match {
          case f if f.nonEmpty => f.toSet
          case _ => Set(accepted1(rnd.nextInt(accepted1.length))._1)
        }
      val survivors1 = accepted1.filterNot(t => forgotten(t._1))
        .map(t => (t._1, t._2)).toSeq
      // every 3rd seed drives the DECLARED twin (the config op is then
      // fuzz-pool-resident like the other forget ops)
      if (seed % 3 == 0) {
        val lines = survivors1.map { case (id, t) =>
          s"""        "{\\"doc_id\\":$id,\\"text\\":\\"${
            StreamingFuzzSpec.esc(t).replace("\\", "\\\\")
              .replace("\"", "\\\"")}\\"}"""" }
          .mkString(",\n")
        val conf = graft.config.PipelineConfig.parse(
          s"""{ "id": "fndr_$seed", "name": "recompute", "steps": [
             |  { "step": "rebuild", "kind": "stream",
             |    "source": { "type": "json_lines",
             |      "schema": "doc_id LONG, text STRING",
             |      "lines": [
             |$lines ] },
             |    "transforms": [ { "op": "near_dup_recompute",
             |      "cols": ["doc_id", "text"], "name": "$base/idx",
             |      "expr": "$sh,$nh,$bd,persist" } ],
             |    "sink": { "type": "json", "path": "$base/view" } } ] }"""
            .stripMargin)
        assert(graft.config.PipelineConfig
          .run(spark, conf, new InMemoryStore)
          .streams("rebuild").status === JobState.Complete,
          s"seed $seed declared recompute")
      } else
        Pipelines.recomputeNearDupIndex(spark, s"$base/idx",
          survivors1.toDF("doc_id", "text"), "doc_id", "text",
          sh, nh, bd, persist = true)
      // continued ingestion: copies of random PRIOR docs (forgotten ones
      // included — shadowing must have stopped) + fresh docs
      val cont = (0 until 4 + rnd.nextInt(4)).map { j =>
        val id = (n + j).toLong
        if (rnd.nextBoolean()) (id, docs(rnd.nextInt(docs.size))._2)
        else (id, freshText())
      }
      runBatch("cont.ndjson", cont)
      val accepted2 = corpus()
      val acceptedIds2 = accepted2.map(_._1).toSet
      // current survivor corpus = post-forget survivors ∪ continuation
      // survivors (forgotten rows are still disk-resident — the index is
      // the similarity state, so they must NOT count)
      val survNow = accepted2.filterNot(t => forgotten(t._1))
        .map(t => (t._1, t._2)).toSeq
      val survDf = survNow.toDF("doc_id", "text")
      // 3. index ≡ current survivors' bands, bit-exact across the fold
      assert(img(spark.read.parquet(s"$base/idx")
          .select("id", "band", "bucket")) ===
        img(Dedup.minhashBandIndex(survDf, "doc_id", "text", sh, nh, bd)),
        s"seed $seed: post-forget index != current survivors' bands")
      // 1. independence among current survivors
      assert(Dedup.minhashNearDups(survDf, "doc_id", "text",
          sh, nh, bd, thr).count() === 0L,
        s"seed $seed: two post-forget survivors are near-dups")
      // 2. witness for every continuation drop, against what was visible
      // to its batch: post-forget survivors ∪ the batch itself
      val dropped = cont.map(_._1).filterNot(acceptedIds2)
      contDropped += dropped.size
      if (dropped.nonEmpty) {
        val ctx = (survivors1 ++ cont).toDF("doc_id", "text")
        val paired = Dedup.minhashNearDups(ctx, "doc_id", "text",
            sh, nh, bd, thr)
          .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
        dropped.foreach(d => assert(paired(d),
          s"seed $seed: continuation doc $d dropped without a witness"))
      }
      // shadowing audit: a continuation copy of a FORGOTTEN doc whose
      // text no longer matches any survivor must be accepted
      val forgottenTexts = accepted1.filter(t => forgotten(t._1))
        .map(_._2).toSet
      val survTexts1 = survivors1.map(_._2).toSet
      reaccepted += cont.count { case (id, t) =>
        forgottenTexts(t) && !survTexts1(t) && acceptedIds2(id) &&
          cont.filter(_._1 < id).forall(_._2 != t)
      }
    }
    assert(contDropped > 0,
      "fixture drift: no continuation drops — the witness check is vacuous")
    assert(reaccepted > 0,
      "fixture drift: no continuation doc re-tested a forgotten text — " +
        "the stopped-shadowing claim is vacuous")
  }
}
