package graft.tools

import graft.GraftSession
import graft.llm.{CorpusStats, Dedup}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe: the sf0.1 bench corpus is small enough that
  * scheduling overhead dominates, so linear-vs-superlinear behavior of the
  * corpus operators is invisible there. This tool generates synthetic
  * corpora at two sizes (default 50k and 200k docs — 4×) with controlled
  * duplicate structure (~1% exact dups, ~1% truncated near-dups, a shared
  * 40-token footer on every 50th doc), runs the heavyweight operators at
  * both sizes, and prints the wall-time ratio per operator. A ratio near
  * the size ratio is evidence the op scales by data volume, not by pair
  * blowup; a superlinear ratio flags a design problem long before a
  * cluster run would.
  *
  * Usage: runMain graft.tools.ScaleProbe [nSmall] [factor]
  * Corpora are written to /tmp/graft_scale_<n>/documents.parquet and reused
  * across invocations (delete to regenerate).
  *
  * Sizing: run with SPARK_DRIVER_MEM=24g. The default 8 GiB heap is not
  * enough execution memory for the big-corpus substring_runs self-join at
  * 32 concurrent tasks ("cannot allocate memory to grow BytesToBytesMap"
  * once ~21M span rows sort under heap/32 each) — the same
  * partitions-must-fit-memory sizing rule the engine documents for real
  * clusters, surfacing at probe scale.
  */
object ScaleProbe {

  /** Hash-derived token stream for a given doc id: ~60–300 tokens from a
    * 20k-word vocab — the SAME formula regenerates any doc's text, which
    * lets planted dups copy their neighbor without a shuffle.
    */
  private def genText(id: Column): Column = {
    val len = (pmod(xxhash64(id), lit(240)) + 60).cast("int")
    array_join(
      transform(sequence(lit(1), len),
        i => concat(lit("w"), pmod(xxhash64(id * 1000 + i), lit(20000)))), " ")
  }

  /** Deterministic synthetic corpus with planted structure: id%100==1 →
    * exact copy of the previous doc; id%100==2 → 80%-truncated near-dup of
    * the previous doc; id%50==7 → shared 40-token footer (real frequent
    * spans). Footer ids never collide with dup-source ids (≡0,1 mod 100).
    */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val id = col("doc_id")
    // both planted copies target doc id-2's ORIGINAL text: doc id-1 (≡1
    // mod 100) is replaced by an exact copy of it, so truncating
    // genText(id-1) would near-dup a text no document carries
    val srcText = genText(id - 2)
    val nearSrc = array_join(slice(split(srcText, " "), lit(1),
      floor((pmod(xxhash64(id - 2), lit(240)) + 60) * 0.8).cast("int")), " ")
    val footer = " " + (1 to 40).map(i => s"f$i").mkString(" ")
    spark.range(n).toDF("doc_id").select(id,
      when(pmod(id, lit(100)) === 1 && id > 1, genText(id - 1))
        .when(pmod(id, lit(100)) === 2 && id > 1, nearSrc)
        .when(pmod(id, lit(50)) === 7, concat(genText(id), lit(footer)))
        .otherwise(genText(id)).as("text"))
  }

  private def materialize(spark: SparkSession, n: Long): String = {
    val dir = s"/tmp/graft_scale_$n"
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      corpus(spark, n).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
    }
    dir
  }

  /** Deterministic synthetic merge table over the probe corpus's character
    * alphabet ('w' + digits): breadth-first concatenation rounds until `n`
    * entries exist — the depth shape of a real mined table (every merge's
    * symbols exist before it), at production size.
    */
  def syntheticMerges(n: Int): Seq[(String, String)] = {
    val alphabet = ("w" +: (0 to 9).map(_.toString)).toVector
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var frontier = alphabet
    while (out.size < n) {
      val next = Vector.newBuilder[String]
      for (l <- frontier; r <- alphabet if out.size < n) {
        out += ((l, r)); next += (l + r)
      }
      frontier = next.result()
    }
    out.toSeq
  }

  /** Planted probe graph: ~2% of n in dup edges plus a 1000-node chain
    * (the diameter-heavy shape) — shared by the components and PageRank
    * probes so their ratios are comparable.
    */
  private def probeEdges(spark: SparkSession, n: Long): DataFrame = {
    val ids = spark.range(n).toDF("id")
    val dupEdges = ids
      .filter(pmod(col("id"), lit(100)) === 1 && col("id") > 1)
      .select(col("id").as("id_a"), (col("id") - 1).as("id_b"))
      .unionByName(ids
        .filter(pmod(col("id"), lit(100)) === 2 && col("id") > 1)
        .select(col("id").as("id_a"), (col("id") - 2).as("id_b")))
    val chain = spark.range(1000).toDF("c")
      .select((col("c") + n).as("id_a"), (col("c") + n + 1).as("id_b"))
    dupEdges.unionByName(chain)
  }

  private var probeSpark: SparkSession = _

  /** Optional row filter (args after nSmall/factor): run only the named
    * rows — iterating on one operator's ratio costs minutes, not the
    * full ~20-minute suite. Unselected rows report −1 and are skipped
    * BEFORE their body evaluates (`f` is by-name). */
  private var onlyRows: Set[String] = Set.empty
  private def selected(label: String): Boolean =
    onlyRows.isEmpty || onlyRows(label)

  /** Listener-summed shuffle-write RECORDS across every stage `f` runs —
    * the wall-independent "what do the Exchanges carry" meter behind the
    * shufvol probe rows. The sleep drains the async listener bus; stage
    * events are posted before the action returns in practice, the pad is
    * for stragglers.
    */
  private def shuffleRecordsOf(f: => Long): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        acc.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    probeSpark.sparkContext.addSparkListener(l)
    try { f; Thread.sleep(1000) }
    finally probeSpark.sparkContext.removeSparkListener(l)
    acc.get()
  }

  private def time(label: String, n: Long)(f: => Long): (String, Double) = {
    if (!selected(label)) return (label, -1.0)
    val t0 = System.nanoTime()
    val rows = f
    val secs = (System.nanoTime() - t0) / 1e9
    // drop every persisted RDD (incl. operators' localCheckpoints) between
    // rows: with ~15 probe ops × 2 corpus sizes the accumulated blocks
    // otherwise exhaust the heap before the ContextCleaner gets to them
    // (observed as an OOM in the 200k gopher row). BLOCKING: the async
    // form loses the race against the next probe's allocation burst — the
    // r10 default-heap run OOMed mid-suite with frees still queued
    probeSpark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    println(f"[scale] n=$n%-8d $label%-18s $secs%7.2f s  ($rows rows)")
    (label, secs)
  }

  def main(args: Array[String]): Unit = {
    val nSmall = args.headOption.map(_.toLong).getOrElse(50000L)
    val factor = args.lift(1).map(_.toInt).getOrElse(4)
    onlyRows = args.drop(2).toSet
    val spark = GraftSession.local(32, "scale-probe")
    probeSpark = spark
    spark.sparkContext.setLogLevel("WARN")

    def runAll(n: Long): Map[String, Double] = {
      val docs = spark.read.parquet(s"${materialize(spark, n)}/documents.parquet")
      (Seq(
        time("near_dup_drop", n) {
          // expected ratio ~4–5x at 4x data: output rows scale exactly
          // linearly (verified: 49001 → 196001), but the components stage
          // is O(log n) star-contraction ROUNDS — when 4x edges trip one
          // extra round the wall ratio reads ≈ 4·(r+1)/r, not 4.0. A true
          // pair blowup would show in the row counts, not just the wall.
          // WALL CAVEAT (r12, measured): this row and the span/substring
          // rows below are spill-heavy — their wall ratios swung 2.7x–9.2x
          // across three same-day runs on an idle machine at identical
          // row counts. Judge them by the printed ROW counts (and the
          // minhash_pairs row below); the wall is weather
          Dedup.dropNearDuplicates(docs, "doc_id", "text",
            maxBucketSize = 10000).count()
        },
        time("minhash_pairs", n) {
          // wall-independent TRUE-pair signal: planted dups are ~2% of
          // n, so the printed confirmed-pair count must scale linearly
          // (measured 1498 → 5998 at 4x — exactly 4.00x)
          Dedup.minhashNearDups(docs, "doc_id", "text").count()
        },
        time("minhash_cands", n) {
          // wall-independent CANDIDATE signal: the pre-confirm volume is
          // the n²·p false-positive term of fixed-width banding — the
          // number to watch (and the knob rows-per-band tunes) when the
          // near_dup_drop wall reads superlinear
          Dedup.minhashCandidateCount(docs, "doc_id", "text")
        },
        time("span_removal", n) {
          // aggregate REAL output columns: a bare count() lets Catalyst
          // eliminate the final unique-key left join and skip the work
          CorpusStats.removeRepeatedSpans(docs, "doc_id", "text",
            spanTokens = 20, maxDf = 5)
            .agg(sum("n_removed"), sum(length(col("clean_text"))))
            .collect().length.toLong
        },
        time("substring_removal", n) {
          // keep-one exact-substring dedup has NO pair stage (coverage is
          // a per-window-hash min(id) rejoin), so the planted footer on
          // every 50th doc — whose occurrence buckets grow with n — must
          // cost n rows, never n²: the wall ratio must track token volume
          CorpusStats.removeDuplicateSubstrings(docs, "doc_id", "text",
            minRunTokens = 20)
            .agg(sum("n_removed"), sum(length(col("clean_text"))))
            .collect().length.toLong
        },
        time("composed_multimodal", n) {
          // the pipeline_multimodal image-leg SHAPE at n/10 media rows
          // (PNG encode dominates corpus build, so the probe scales the
          // id set, not the pixel dims): decode-gate → dhash dedup →
          // decon vs a FIXED 200-image reference → per-source cap. Bytes
          // are touched exactly once (one imageHashes pass feeds all
          // three stages); pair volume is hamming-chunk bounded, so the
          // 4× wall ratio must track the decode scan, not pairs
          import graft.llm.{ImageHash, ImageHashed, Selection}
          import spark.implicits._
          val m = n / 10
          // rendition dims stay multiples of 8 (32×24 → 64×48): the 8×8
          // area-average grid is resize-exact only then, and the probe
          // needs the planted pairs to actually exist
          val media = spark.range(m).as[Long].flatMap { id =>
            val base =
              if (id % 10 == 3)
                (id, Array.tabulate(64)(i => ((id * 31 + i) % 251).toByte))
              else (id, ImageHash.synthPng(id, 32, 24))
            if (id % 4 == 0)
              Seq(base, (id + 10000000L, ImageHash.synthJpeg(id, 64, 48)))
            else Seq(base)
          }.toDF("media_id", "media")
          val ref = spark.range(200).as[Long]
            .map(id => (id * 8 + 2 + 20000000L,
              ImageHash.synthJpeg(id * 8 + 2, 64, 48)))
            .toDF("media_id", "media")
          val hashed = ImageHash.imageHashes(media, "media_id", "media")
            .toDF().localCheckpoint()
          val gated = media.join(hashed.filter(col("decoded"))
            .select(col("id").as("media_id")), Seq("media_id"), "left_semi")
          val surv = Dedup.applySurvivors(gated, "media_id",
            Dedup.survivorAssignment(ImageHash.nearDupPairs(
              hashed.as[ImageHashed], maxHamming = 3)))
          val refH = ImageHash.imageHashes(ref, "media_id", "media").toDF()
            .filter(col("decoded")).select(col("id"), col("dhash").as("fp"))
          val dirty = Dedup.hamming64PairsIncremental(
              hashed.filter(col("decoded"))
                .select(col("id"), col("dhash").as("fp")), refH, 3)
            .filter(col("id_b") >= 20000000L)
            .select(col("id_a").as("media_id")).distinct()
          Selection.capPerGroup(
            surv.join(dirty, Seq("media_id"), "left_anti")
              .withColumn("src", pmod(col("media_id"), lit(5)).cast("string")),
            "src", negate(col("media_id")), "media_id", n = 1000).count()
        },
        time("substring_runs", n) {
          // the REPORT form does pair — so the cap must bind on the
          // boilerplate footer (n/50 occurrences per window hash at both
          // sizes, > 100): runs may come only from the isolated planted
          // dup pairs (bucket size 2), keeping candidates span-bounded.
          // A superlinear ratio here = the cap stopped pruning
          CorpusStats.maximalSharedRuns(docs, "doc_id", "text",
            minRunTokens = 20, maxOccPerSpan = 100)
            .agg(sum("run_len")).collect().length.toLong
        },
        time("tfidf", n) {
          CorpusStats.tfidfKeywords(docs, "doc_id", "text", k = 5).count()
        },
        time("fuzzy_pairs", n) {
          // 24-char key prefixes: candidates need an ALIGNED segment
          // match (PassJoin pigeonhole), so volume is segment-collision
          // bounded — shared first tokens still grow their blocks
          // linearly with n (pairs quadratically, capped), which is the
          // price of exact recall; the r10 gram→segment rewrite cut
          // candidates 3.8× and the big-size wall ~7× at identical
          // output pairs
          Dedup.fuzzyNearDupPairs(
            docs.select(col("doc_id"),
              substring(col("text"), 1, 24).as("key")),
            "doc_id", "key", maxDist = 2).count()
        },
        time("lm_score", n) {
          CorpusStats.bigramLmScore(docs, "doc_id", "text").count()
        },
        time("vs_ref_near", n) {
          // fixed-size reference suite (1k truncated docs) vs the growing
          // corpus: the suite broadcasts, so wall time must track the
          // corpus scan — a superlinear ratio would mean the inverted
          // index probe degraded into pair blowup
          // doc_id < nSmall keeps the suite IDENTICAL at both corpus
          // sizes (limit() would grow it with n and pollute the ratio)
          val ref = docs
            .filter(pmod(col("doc_id"), lit(100)) === 3 &&
              col("doc_id") < nSmall)
            .select((col("doc_id") + n * 10).as("doc_id"),
              array_join(slice(split(col("text"), " "), lit(1), lit(60)),
                " ").as("text"))
          Dedup.nearDupsVsReference(docs, ref, "doc_id", "text",
            shingleN = 3, threshold = 0.3).count()
        },
        time("components_dist", n) {
          // the star-contraction path itself (localThreshold = 0 disables
          // the driver union-find shortcut): the corpus's planted dup
          // edges (~2% of n) plus a 1000-node chain — the diameter-heavy
          // shape whose convergence must stay O(log n) rounds, so the 4×
          // wall ratio should track edge count, not blow up
          Dedup.survivorAssignment(probeEdges(spark, n),
            localThreshold = 0).count()
        },
        time("pagerank_dist", n) {
          // fixed 5 power iterations over the same planted graph: per
          // round one edge-sized join + agg, so the wall ratio must track
          // edge count — a superlinear ratio would mean rank rows stopped
          // being slim (id, long) pairs
          graft.llm.Graph.pageRankCentrality(probeEdges(spark, n)).count()
        },
        time("nb_score", n) {
          // model is vocab-sized at any corpus size; scoring joins slim
          // (id, token, m) rows — wall must track token volume
          graft.llm.Classifier.naiveBayesSelfScore(docs, "doc_id", "text",
            pmod(col("doc_id"), lit(10)) === 0)
            .agg(sum("nb_margin_micro")).collect().length.toLong
        },
        time("vocab_topk_mg", n) {
          // per-partition sketches cap the shuffle at m rows/partition:
          // the only n-scaled stage is the map-only scan (plus the
          // confirm scan when partitions evict). m = 32768 because this
          // corpus's Zipf tail puts the 100th count near N/4096 — the
          // default capacity cannot certify and would fall back
          CorpusStats.vocabTopKSketch(docs, "text", k = 100,
            sketchCapacity = 32768).count()
        },
        time("unigram_encode", n) {
          // pieces + DP kernel both run over the DISTINCT vocab with the
          // piece table broadcast; the per-doc join is the n-scaled stage
          val pieces = graft.llm.Tokenizer.unigramPieces(docs, "text", 256, 4)
          graft.llm.Tokenizer.unigramEncodeCounts(docs, "doc_id", "text",
              pieces)
            .agg(sum("n_pieces")).collect().length.toLong
        },
        time("gopher_rules", n) {
          // line + n-gram + span aggregates: wall time must track token
          // volume (all shuffles carry slim (id, hash, count) rows)
          graft.llm.GopherRules.gate(docs, "doc_id", "text")
            .agg(sum(when(col("gopher_keep"), 1L).otherwise(0L)))
            .collect().length.toLong
        },
        time("dsir_weights", n) {
          // model tables stay 4096 rows at any corpus size: the scan and
          // the (id, bucket) agg are the only n-scaled stages
          graft.llm.Dsir.importanceWeights(docs, "doc_id", "text",
            pmod(col("doc_id"), lit(10)) === 0)
            .agg(sum("weight_micro")).collect().length.toLong
        },
        time("bm25_topk", n) {
          // the query-term model is constant-size: scoring must track the
          // posting volume of the matched terms (a fixed vocab slice), so
          // the ratio should sit at-or-below the data ratio
          graft.llm.Retrieval.bm25TopK(docs, "doc_id", "text",
            Seq("q1" -> "w17 w4242 w99", "q2" -> "w1234 w777"), 10).count()
        },
        time("ann_ivf", n) {
          // the r11 engine-exact IVF path at n/10 synthetic 64-dim
          // vectors, FIXED 64 cells / 8 probes: training is one bounded
          // TakeOrdered sample collect, corpus assignment and query
          // probing are map-only kernels, and candidates are the probed
          // fraction of the corpus (linear at fixed cells) — the 4× wall
          // ratio must track vector volume; a blowup would mean the
          // candidate join or re-rank stopped being probe-bounded
          val m = n / 10
          val emb = spark.range(m).toDF("vec_id").select(col("vec_id"),
            transform(sequence(lit(1), lit(64)),
              i => (pmod(xxhash64(col("vec_id") * 131 + i), lit(2001))
                - 1000).cast("double") / 1000.0).as("embedding"))
          graft.llm.Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb,
            k = 10, nCells = 64, nProbe = 8, trainIters = 2).count()
        },
        time("bpe_merges", n) {
          // after the initial word count every round is vocab-sized; the
          // corpus-scaled stage is the one scan, so the ratio should
          // approach the scan ratio as n grows
          graft.llm.Tokenizer.bpeMerges(docs, "text", 4).count()
        },
        time("bpe_enc_kernel", n) {
          // production merge-table depth: 4096 synthetic merges through
          // the mapPartitions kernel — the chained-replace fold cannot
          // even ANALYZE a plan this deep. Cost is O(|merges|) hash
          // probes per DISTINCT word, so the ratio should track the
          // vocab (sublinear in n once the 20k-word vocab saturates)
          graft.llm.Tokenizer.applyMergesTokenCountsKernel(docs, "doc_id",
              "text", syntheticMerges(4096))
            .agg(sum("n_bpe_tokens")).collect().length.toLong
        },
        time("composed_curate", n) {
          // the pipeline_curate2 SHAPE end-to-end (NB filter → winnow
          // pairs → keep-central → temperature mixture → snake shards):
          // unit probes pin each operator, but here stage OUTPUTS feed
          // stage inputs — a pair blowup born of the composition (the NB
          // filter reshaping winnow buckets, the survivor set skewing the
          // mixture walk) only shows up in the chained ratio
          val scored = graft.llm.Classifier.naiveBayesSelfScore(docs,
            "doc_id", "text", pmod(col("doc_id"), lit(10)) === 0)
          val kept = docs.join(scored.filter(col("nb_pos"))
            .select(col("doc_id")), Seq("doc_id"), "left_semi")
            .localCheckpoint()
          val pairs = Dedup.winnowNearDupPairs(kept, "doc_id", "text",
            k = 5, w = 4, minShared = 2)
          val surv = graft.llm.Dedup.applySurvivorsKeepCentral(kept,
            "doc_id", pairs)
          val withSrc = surv.withColumn("source",
            pmod(col("doc_id"), lit(5)).cast("string"))
          val sel = graft.llm.Mixture.temperatureSelect(withSrc, "source",
            graft.llm.TextOps.tokenCount(col("text")),
            budgetOf = total => total / 2L, idCol = "doc_id")
          graft.llm.Packing.shardBalanced(sel, "doc_id",
            graft.llm.TextOps.tokenCount(col("text")), nShards = 4).count()
        },
        time("datacard_panel", n) {
          // the extended corpus_datacard SHAPE (minus the separately
          // probed unigram leg): per-group Zipf via the range-partitioned
          // rank over the VOCAB, per-group Gini via the rank over DOCS,
          // OOV vs a fixed top-20 vocab — every leg collapses to group
          // cardinality before the joins, so the wall ratio must track
          // token volume; a superlinear ratio would mean a rank or join
          // stopped being range-partitioned/broadcast
          val docs4 = docs.withColumn("lang",
            concat(lit("l"), pmod(col("doc_id"), lit(4))))
          val zipf = CorpusStats.zipfAlphaByGroup(docs4, "lang", "text",
            k = 64)
          val gini = graft.etl.Profile.giniByGroup(
            docs4.select(col("lang"),
              size(split(col("text"), " ")).cast("long").as("n_toks"),
              col("doc_id")),
            "lang", "n_toks", "doc_id")
          val vocab = docs4
            .select(explode(split(col("text"), " ")).as("word"))
            .groupBy("word").agg(count(lit(1)).as("freq"))
            .orderBy(col("freq").desc, col("word").asc).limit(20)
            .select("word")
          val oov = CorpusStats.oovRate(docs4, "doc_id", "text", vocab)
            .join(docs4.select(col("doc_id"), col("lang")), Seq("doc_id"))
            .groupBy(col("lang"))
            .agg(sum(col("n_tokens")).as("nt"), sum(col("n_oov")).as("no"))
          zipf.join(gini, Seq("lang")).join(oov, Seq("lang"))
            .collect().length.toLong
        },
        time("bt_strengths", n) {
          // n-scaled comparison log over a FIXED 200-item universe: the
          // one log-sized pass is the pair aggregation; the 5 MM rounds
          // then join the ≤200·199/2-row pair table against 200 strengths
          // — wall must track the log size, with the iteration cost flat
          val cmp = docs.select(
            concat(lit("m"), pmod(xxhash64(col("doc_id")), lit(200)))
              .as("winner"),
            concat(lit("m"), pmod(xxhash64(col("doc_id") * 7), lit(200)))
              .as("loser"))
          graft.llm.Ranking.btStrengths(cmp, "winner", "loser").count()
        },
        time("weighted_sample", n) {
          // map-only md5 uniform + staged ln, then a WindowGroupLimit-
          // pushed top-k per group: both stages scan-shaped, so the 4×
          // ratio must stay near 4
          graft.llm.Selection.weightedSampleK(
            docs.withColumn("grp", pmod(col("doc_id"), lit(20))),
            "grp", "doc_id", graft.llm.TextOps.tokenCount(col("text")),
            k = 10).count()
        },
        time("hll_tokens", n) {
          // register build is one map-side-combined max agg over exploded
          // tokens; estimate reads 256 rows/group — token-volume-linear
          graft.llm.Sketches.hllEstimate(
            docs.select(col("doc_id"),
              explode(split(col("text"), " ")).as("tok"))
              .withColumn("grp", pmod(col("doc_id"), lit(8))),
            "grp", col("tok")).count()
        },
        time("rouge_vs_ref", n) {
          // fixed 500-item reference suite (24-token prefixes) vs the
          // growing corpus (48-token prefixes): the suite broadcasts,
          // the pass is map-only, and the overlap bound gates each DP —
          // wall must track the corpus scan; a superlinear ratio would
          // mean the prune stopped rejecting far pairs
          val tokOf = (d: DataFrame, k: Int) => d.select(col("doc_id"),
            slice(split(col("text"), " "), 1, k).as("toks"))
          val ref = tokOf(docs.filter(pmod(col("doc_id"), lit(100)) === 3 &&
            col("doc_id") < 50000L), 24)
          Dedup.rougeLVsReference(tokOf(docs, 48), ref, "doc_id", "toks",
            "doc_id", "toks").count()
        },
        time("perceptron_fit", n) {
          // 3 rounds × (one feature-vs-weights hash join + two keyed
          // aggs) over slim integer rows; the weight table is ≤dim rows
          // at any corpus size — wall must track token volume
          val lab = docs.withColumn("y", pmod(col("doc_id"), lit(10)) === 0)
          graft.llm.Classifier.perceptronTrain(lab, "doc_id", "text", "y",
            dim = 4096, iterations = 3).count()
        }) ++ (
        if (!selected("semdedup_incr")) Seq("semdedup_incr" -> -1.0) else {
          // continuous SemDeDup (r11 VERDICT ask #4): the per-batch cost
          // of the incremental path must track the BATCH and its touched
          // cells, never the accumulated history. Setup (untimed): a
          // frozen 256-cell centroid table trained on a FIXED uniform
          // sample (independent of n — the frozen stance); a history of
          // n vectors concentrated 99% in 8 "heavy" directions the batch
          // never probes plus a 1% uniform tail; and a fixed
          // 2048-vector batch of scaled copies of 8 OTHER directions
          // (amax-relative int8 makes a scaled copy quantize — and land —
          // identically to its direction). The timed stage is ONE
          // incremental batch against the grown state: the touched-cell
          // prune keeps the history join micro-batch-cell-sized, so the
          // 4x-history wall ratio must stay near 1; if the prune broke,
          // the pair stage would see the heavy cells and main's guarded
          // ratio below would trip. History state is built via the same
          // entry point with the pair stage left lazy (only ._2 is
          // materialized), so setup stays linear.
          def dirVec(seed: Column): Column =
            transform(sequence(lit(1), lit(64)),
              i => (pmod(xxhash64(seed * 131 + i), lit(2001)) - 1000)
                .cast("double") / 1000.0)
          def scaled(v: Column, id: Column): Column =
            transform(v, x =>
              x * (lit(1.0) + pmod(id, lit(97)).cast("double") / 1000.0))
          val trainTbl = spark.range(4096).toDF("vec_id")
            .select(col("vec_id"), dirVec(col("vec_id") + 7777)
              .as("embedding"))
          val cents = graft.llm.Similarity
            .intCentroidTable(trainTbl, 256, 2).localCheckpoint()
          val hist = spark.range(n).toDF("vec_id").select(col("vec_id"),
            when(pmod(col("vec_id"), lit(100)) === 0,
              dirVec(col("vec_id")))
              .otherwise(scaled(
                dirVec(lit(100) + pmod(col("vec_id"), lit(8))),
                col("vec_id")))
              .as("embedding"))
          import spark.implicits._
          val noState =
            Seq.empty[(Int, Long, Seq[Int])].toDF("cell", "id", "q")
          val histIdx = graft.llm.Similarity.semDedupIncremental(noState,
            hist, cents, 0.99, "vec_id", "embedding", Int.MaxValue)._2
          val batch = spark.range(2048).toDF("vec_id").select(
            (col("vec_id") + n * 10).as("vec_id"),
            scaled(dirVec(pmod(col("vec_id"), lit(8))), col("vec_id"))
              .as("embedding")).localCheckpoint()
          // wall-independent VOLUME signals (r12 VERDICT ask #6): the
          // prune's health is a count property — touched cells are a
          // function of the FIXED batch alone, and the candidate-pair
          // volume is dominated by the in-batch term, so both must stay
          // ~constant as history grows no matter how noisy the machine.
          // hist_rows is the 1%-uniform-tail leakage into touched cells
          // (grows with the TAIL, stays micro-batch-scale) — printed for
          // triage, asserted only through the pair count it feeds.
          // Counted BEFORE the timed row: time() drops every persisted
          // RDD afterwards, including the setup checkpoints both share
          val (fIdx, touched, allv, pairs) = graft.llm.Similarity
            .semDedupIncrementalFrames(histIdx, batch, cents,
              "vec_id", "embedding", 10000)
          val cells = touched.count().toDouble
          val cand = pairs.count().toDouble
          val histRows = (allv.count() - fIdx.count()).toDouble
          println(f"[scale] n=$n%-8d semdedup_volumes   cells=$cells%.0f " +
            f"hist_rows=$histRows%.0f cand_pairs=$cand%.0f")
          val wall = time("semdedup_incr", n) {
            graft.llm.Similarity.semDedupIncremental(histIdx, batch,
              cents, 0.99, "vec_id", "embedding", 10000)._1.count()
          }
          Seq(wall, "semdedup_cells" -> cells,
            "semdedup_hist_rows" -> histRows, "semdedup_cand_pairs" -> cand)
        }) ++ (
        if (!selected("shufvol")) Seq.empty else {
          // Shuffle-VOLUME meter (r13, the shuffle audit's runtime half):
          // ScanAuditSpec pins how many Exchanges each plan HAS; this row
          // family pins what they CARRY. A listener sums shuffle-write
          // RECORDS while each op runs over a fixed-partition (8) slim
          // frame at n and factor·n. The map-side-bounded family — per-
          // group top-k (WindowGroupLimit heap), HLL register partial-agg
          // (≤ 256 registers/group/partition), the bottom-k quantile
          // sample — must shuffle ≤ parts × groups × bound rows,
          // CONSTANT in n; the exact-distinct contrast row (unique keys,
          // so partial agg cannot reduce) must shuffle linearly, proving
          // the meter measures. Records are counted, never clocked —
          // these ratios survive any machine weather.
          val base = docs.select(pmod(col("doc_id"), lit(16)).as("g"),
              length(col("text")).cast("long").as("v"),
              col("doc_id").as("id"))
            .repartition(8).localCheckpoint() // eager, BEFORE any meter
          // every row consumes REAL output columns (the span_removal
          // lesson above): a bare count() lets Catalyst prune the agg
          // expressions — the first hll cut measured distinct(g), 129
          // records, instead of the register table
          val topk = shuffleRecordsOf(graft.llm.Selection.capPerGroup(
            base, "g", col("v"), "id", 16)
            .agg(sum("v"), sum("rank")).collect().length.toLong).toDouble
          val hll = shuffleRecordsOf(graft.llm.Sketches.hllEstimate(
            base.select(col("g").cast("string").as("g"), col("id")),
            "g", col("id").cast("string"))
            .agg(sum("n_hll")).collect().length.toLong).toDouble
          val bk = shuffleRecordsOf(graft.queries.Relational
            .bottomKQuantiles(base, "g", 32)
            .agg(sum("p25"), sum("median"), sum("p75"))
            .collect().length.toLong).toDouble
          val dist = shuffleRecordsOf(
            base.select(col("id")).distinct().count()).toDouble
          println(f"[scale] n=$n%-8d shufvol_records    topk=$topk%.0f " +
            f"hll=$hll%.0f bottomk=$bk%.0f distinct=$dist%.0f")
          probeSpark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          Seq("shufvol_topk_recs" -> topk, "shufvol_hll_recs" -> hll,
            "shufvol_bottomk_recs" -> bk, "shufvol_distinct_recs" -> dist)
        }) ++ (
        if (!selected("bitext")) Seq.empty else {
          // Candidate-fed vs all-pairs bitext mining (r15 — the ask-#1
          // scale claim made measurable). Two meters:
          //   - shuffle RECORDS end-to-end for the candidate-fed path,
          //     which must stay ~linear in side size (every stage is
          //     k-bounded per vector).
          //   - SCORED-PAIR volume for the contrast: all-pairs scores
          //     exactly |S|·|T| pairs (quadratic by construction — the
          //     bounded-sides contract's reason to exist), while the
          //     candidate-fed pair set must honor its DOCUMENTED
          //     absolute bound ≤ 2k(|S|+|T|) at any side size.
          // Measured finding recorded here (first probe run): shuffle
          // records CANNOT see the all-pairs danger — Spark 4 plans the
          // rank-filtered k-NN windows as WindowGroupLimit, which caps
          // each window's map output at k rows per group per partition,
          // so even the all-pairs path shuffles linearly (90 001 records
          // at 2000×2000 sides). Its quadratic cost is map-side COMPUTE
          // (|S|·|T| cosine kernels inside the cross-join stage), which
          // is exactly why the contrast row meters pair volume, not
          // records. Sides are n/25; deterministic integer-derived
          // vectors — varied sims, no RNG.
          val side = math.max(400L, n / 25)
          def vecs(parity: Int) = probeSpark.range(side)
            .select((col("id") * 2 + parity).as("id"))
            .withColumn("v", expr(
              "transform(sequence(0, 7), " +
                "j -> CAST(pmod(id * (j + 3), 101) AS DOUBLE) - 50.0)"))
            .repartition(8).localCheckpoint() // eager, BEFORE any meter
          val src = vecs(0); val tgt = vecs(1)
          // boundedQueries = false: this row exists to meter the
          // UNBOUNDED corpus-mining plan (the 100 TB claim) — the
          // default broadcast mode emits no shuffle records for the
          // probe join, so metering it would validate the wrong plan
          // shape (r15 advice). Matches the bitext_mine config op and
          // ret_bitext_ann.
          def lists(q: org.apache.spark.sql.DataFrame,
              c: org.apache.spark.sql.DataFrame) =
            graft.llm.Similarity.ivfTopK(q, c, 4, nCells = 32,
              nProbe = 4, idCol = "id", vecCol = "v",
              boundedQueries = false, excludeSelf = false)
          val cf = shuffleRecordsOf(
            graft.llm.Retrieval.bitextMineFromCandidates(src, tgt,
              "id", "v", lists(src, tgt), lists(tgt, src),
              4, 1000000L).count()).toDouble
          // scored-pair volumes: all-pairs by construction, candidate-fed
          // rebuilt exactly as the operator builds it (union distinct of
          // the two direction lists)
          val apPairs = (side * side).toDouble
          val cfPairs = lists(src, tgt)
            .select(col("query_id").as("a"), col("neighbor_id").as("b"))
            .unionByName(lists(tgt, src)
              .select(col("neighbor_id").as("a"), col("query_id").as("b")))
            .distinct().count().toDouble
          println(f"[scale] n=$n%-8d bitext_volumes     side=$side%d " +
            f"candfed_recs=$cf%.0f candfed_pairs=$cfPairs%.0f " +
            f"allpairs_pairs=$apPairs%.0f")
          // the OTHER candidate generator (r16): annTopKBitext's shared
          // hyperplane index, metered on the same sides and the same
          // absolute pair bound — the lsh feed's linearity is now
          // recorded beside the ivf feed's, not assumed from it.
          // bits = 0 (the autoLshBits rule) + a population-scaled bucket
          // cap are the point of the row. Measured history, recorded:
          // fixed bits = 8 metered the candidate distinct at 15.94x
          // records for 4x sides (bucket population ∝ n at fixed width
          // ⇒ n²/2^bits candidates) — autoLshBits exists because of
          // that reading. Auto width ALONE still metered 8.78x: these
          // structured vectors hash into skewed buckets, and a heavy
          // bucket's candidate volume is popQ·popC — quadratic no
          // matter the width. The full linear contract is width (keeps
          // the TYPICAL bucket at the 16-target) + maxBucketSize (the
          // hard per-bucket bound, here 8x the target), which this row
          // guards end-to-end; the recall cost of a dropped mega-bucket
          // is annTopK's documented degenerate-bucket trade
          val (lf, lb) = graft.llm.Similarity.annTopKBitext(src, tgt, 4,
            tables = 4, bits = 0, idCol = "id", vecCol = "v",
            maxBucketSize = 8 * graft.llm.Similarity.LshTargetBucketPop)
          val lshRecs = shuffleRecordsOf(
            graft.llm.Retrieval.bitextMineFromCandidates(src, tgt,
              "id", "v", lf, lb, 4, 1000000L).count()).toDouble
          val lshPairs = lf
            .select(col("query_id").as("a"), col("neighbor_id").as("b"))
            .unionByName(lb
              .select(col("neighbor_id").as("a"), col("query_id").as("b")))
            .distinct().count().toDouble
          println(f"[scale] n=$n%-8d bitext_lsh         side=$side%d " +
            f"lsh_recs=$lshRecs%.0f lsh_pairs=$lshPairs%.0f")
          probeSpark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          Seq("bitext_candfed_recs" -> cf,
            "bitext_candfed_pairs" -> cfPairs,
            "bitext_lsh_recs" -> lshRecs,
            "bitext_lsh_pairs" -> lshPairs,
            "bitext_allpairs_pairs" -> apPairs,
            "bitext_side" -> side.toDouble)
        })).toMap
    }

    // warm the JVM/codegen on the small corpus before measuring
    spark.read.parquet(s"${materialize(spark, nSmall)}/documents.parquet").count()
    val small = runAll(nSmall)
    val big = runAll(nSmall * factor)
    println(f"[scale] == ratios at ${factor}x data (linear = $factor.0) ==")
    small.keys.toSeq.sorted.filter(k => small(k) >= 0).foreach { k =>
      println(f"[scale] $k%-18s ${big(k) / small(k)}%5.2fx")
    }
    // bounded-growth guard (r11 VERDICT ask #4, volume form r12 ask #6):
    // a FIXED batch against 4x the accumulated SemDeDup state must see
    // the same work — the touched-cell prune is what makes the ingest
    // loop viable at 100 TB of history. PRIMARY signals are counts,
    // which survive a noisy machine: touched cells are a function of
    // the fixed batch alone (must be EQUAL), and candidate pairs are
    // dominated by the constant in-batch term (1.25 leaves room for the
    // uniform tail's linear-in-history leakage into touched cells,
    // ~0.1% of the pair volume at the probe's mixture — a broken prune
    // reads ~n/batch x). The wall ratio stays a SECONDARY signal with
    // its noise-headroom band.
    if (selected("semdedup_incr")) {
      require(big("semdedup_cells") == small("semdedup_cells"),
        f"[scale] touched cells moved ${small("semdedup_cells")}%.0f → " +
          f"${big("semdedup_cells")}%.0f under a FIXED batch — cell " +
          "assignment is reading history state")
      val pr = big("semdedup_cand_pairs") / small("semdedup_cand_pairs")
      require(pr <= 1.25,
        f"[scale] candidate pairs grew $pr%.2fx at ${factor}x history " +
          "(cand_pairs " + f"${small("semdedup_cand_pairs")}%.0f → " +
          f"${big("semdedup_cand_pairs")}%.0f) — the cell-pruned " +
          "history join stopped being micro-batch-sized")
      val sdr = big("semdedup_incr") / small("semdedup_incr")
      require(sdr <= 2.5,
        f"[scale] semdedup_incr wall grew $sdr%.2fx at ${factor}x " +
          "history with healthy volumes — investigate the plan, not " +
          "the prune")
    }
    // shuffle-volume guards (r13): the bounded family's shuffle records
    // are parts × groups × bound — independent of n — so their ratio at
    // factor× data must stay ≈ 1 (1.3 leaves room for a straggler stage
    // retry); the unique-key distinct contrast must move ≈ linearly or
    // the meter itself is broken. Pure record counts: no wall anywhere.
    if (selected("shufvol")) {
      for (k <- Seq("shufvol_topk_recs", "shufvol_bottomk_recs")) {
        val r = big(k) / small(k)
        require(r <= 1.3,
          f"[scale] $k grew $r%.2fx at ${factor}x data (" +
            f"${small(k)}%.0f → ${big(k)}%.0f) — the map-side bound " +
            "stopped capping the shuffle")
      }
      // HLL registers FILL toward their ceiling as n grows (78% full at
      // 50k/8-partition, ~100% at 200k — a ratio test would be fragile),
      // so the guard is the absolute bound itself: parts × groups × 256
      // register rows + the estimator's two slim downstream stages
      val hllCeil = 8.0 * 16 * 256 + 64
      require(big("shufvol_hll_recs") <= hllCeil &&
          small("shufvol_hll_recs") <= hllCeil,
        f"[scale] hll register shuffle exceeded its parts×groups×256 " +
          f"ceiling ($hllCeil%.0f): ${small("shufvol_hll_recs")}%.0f → " +
          f"${big("shufvol_hll_recs")}%.0f — partial aggregation " +
          "stopped bounding the map output")
      val dr = big("shufvol_distinct_recs") / small("shufvol_distinct_recs")
      require(dr >= factor * 0.7,
        f"[scale] the linear contrast row moved only $dr%.2fx at " +
          f"${factor}x data — the shuffle meter is not measuring")
    }
    // bitext volume guards (r15): the candidate-fed mining path must
    // shuffle ~linearly in side size AND honor its documented absolute
    // scored-pair bound ≤ 2k(|S|+|T|) at every size; the all-pairs
    // scored-pair volume is |S|·|T| by construction — printed beside it
    // so the round artifact records the quadratic-vs-linear contrast in
    // the same units. Pure counts, no wall.
    if (selected("bitext")) {
      val cr = big("bitext_candfed_recs") / small("bitext_candfed_recs")
      require(cr <= factor * 1.4,
        f"[scale] candidate-fed bitext shuffle grew $cr%.2fx at " +
          f"${factor}x side size (${small("bitext_candfed_recs")}%.0f → " +
          f"${big("bitext_candfed_recs")}%.0f) — a stage stopped being " +
          "k-bounded per vector")
      val lr = big("bitext_lsh_recs") / small("bitext_lsh_recs")
      require(lr <= factor * 1.4,
        f"[scale] lsh-fed bitext shuffle grew $lr%.2fx at ${factor}x " +
          f"side size (${small("bitext_lsh_recs")}%.0f → " +
          f"${big("bitext_lsh_recs")}%.0f) — a stage stopped being " +
          "k-bounded per vector")
      for (m <- Seq(small, big); key <- Seq("bitext_candfed_pairs",
          "bitext_lsh_pairs")) {
        val bound = 2.0 * 4 * (2 * m("bitext_side"))
        require(m(key) <= bound,
          f"[scale] $key ${m(key)}%.0f exceeds the documented " +
            f"2k(|S|+|T|) = $bound%.0f bound — candidate generation " +
            "stopped being top-k lists")
      }
      val pr = big("bitext_allpairs_pairs") / big("bitext_candfed_pairs")
      println(f"[scale] bitext contrast: all-pairs scores $pr%.0fx more " +
        "pairs than the candidate-fed path at the large side size")
    }
    spark.stop()
  }
}
