package graft

import graft.etl.Fixtures
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming decode: errors-as-data over a file stream (3 ok / 2 err)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in")
    java.nio.file.Files.write(dir.resolve("drop1.ndjson"),
      Fixtures.malformedJsonStream.mkString("\n").getBytes)
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("todo", ArrayType(StringType)),
      StructField("id", StringType)))
    val q = Streams.decodeJsonStream(spark, dir.toString + "/*.ndjson", schema)
      .writeStream.format("memory").queryName("dec").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("dec")
    assert(rows.count() === 5)
    assert(rows.filter($"is_error").count() === 2)
    assert(rows.filter(!$"is_error").count() === 3)
  }

  test("watermarked tumbling-window aggregation emits closed windows") {
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = Streams.windowedEventAgg(df, "ts", "10 seconds", "1 minute")
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    mem.addData((ts("2024-01-01 00:00:10"), "click", 1.0),
      (ts("2024-01-01 00:00:20"), "click", 2.0),
      (ts("2024-01-01 00:00:30"), "view", 5.0))
    q.processAllAvailable()
    // advance watermark far past the first window so it closes
    mem.addData((ts("2024-01-01 00:10:00"), "click", 9.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("winagg")
      .select($"event_type", $"n", $"sum_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out === Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("session windows split on gap") {
    val mem = MemoryStream[(Timestamp, Long)](spark)
    val df = mem.toDF().toDF("ts", "user_id")
    val q = Streams.sessionWindows(df, "ts", "5 minutes", "user_id")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    mem.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:01:00"), 1L),
      (ts("2024-01-01 00:20:00"), 1L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 01:00:00"), 2L)) // advance watermark
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("sessions")
      .select($"user_id", $"n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sessions.count(_ == (1L, 2L)) === 1) // first session: 2 events
    assert(sessions.count(_ == (1L, 1L)) === 1) // second session: 1 event
  }

  test("stateful dedup runs on the RocksDB state store (bounded-memory state at scale)") {
    // RocksDB spills keyed state to local disk — the provider to run with
    // when dedup state is corpus-sized; prove the integration works here
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[String](spark)
      val out = Streams.streamingDedupByKey(mem.toDS(), (s: String) => s)
      val q = out.writeStream.format("memory").queryName("rocksdedup")
        .outputMode("append").start()
      mem.addData("a", "b", "a")
      q.processAllAvailable()
      mem.addData("b", "c")
      q.processAllAvailable(); q.stop()
      val got = spark.table("rocksdedup").as[String].collect().sorted
      assert(got.toSeq === Seq("a", "b", "c"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming dedup keeps first occurrence across micro-batches") {
    val mem = MemoryStream[String](spark)
    val deduped = Streams.streamingDedupByKey(mem.toDS(), identity[String])
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    mem.addData("a", "b", "a")
    q.processAllAvailable()
    mem.addData("b", "c") // b already seen in batch 1
    q.processAllAvailable(); q.stop()
    val seen = spark.table("dedup").as[String].collect().sorted
    assert(seen.toSeq === Seq("a", "b", "c"))
  }

  test("k-anonymity release gate: rows held until their group reaches k") {
    val mem = MemoryStream[(Long, String)](spark)
    val gated = Streams.kAnonReleaseGate[(Long, String)](mem.toDS(), _._2, k = 3)
    val q = gated.writeStream.format("memory").queryName("kanon")
      .outputMode("append").start()
    def released(): Set[Long] =
      spark.table("kanon").as[(Long, String)].collect().map(_._1).toSet
    // batch 1: us has only 2 rows, de 1 — NOTHING may be visible yet
    mem.addData((1L, "us"), (2L, "us"), (3L, "de"))
    q.processAllAvailable()
    assert(released() === Set.empty)
    // batch 2: us reaches 3 → its whole backlog releases; de still held
    mem.addData((4L, "us"), (5L, "de"))
    q.processAllAvailable()
    assert(released() === Set(1L, 2L, 4L))
    // batch 3: an open group releases immediately; de reaches 3
    mem.addData((6L, "us"), (7L, "de"))
    q.processAllAvailable(); q.stop()
    assert(released() === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    // convergence: the final released set equals the batch release gate
    // over everything ingested (counts only grow, so the answers agree)
    val all = Seq((1L, "us"), (2L, "us"), (3L, "de"), (4L, "us"),
      (5L, "de"), (6L, "us"), (7L, "de")).toDF("id", "country")
    val batchKept = graft.llm.Privacy.suppressSmallGroups(all,
      Seq("country"), 3).select($"id").as[Long].collect().toSet
    assert(released() === batchKept)
  }

  test("nearDupIngest dedups each batch against the persisted index and itself") {
    val base = java.nio.file.Files.createTempDirectory("graft_ndi").toString
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.nearDupIngest(
      mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$base/corpus", s"$base/index", s"$base/ckpt")
    val docA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val docB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val docATrunc = (1 to 32).map(i => s"alpha$i").mkString(" ") // ~0.8 jaccard
    val docD = (1 to 40).map(i => s"delta$i").mkString(" ")
    // batch 1: A, B, and a WITHIN-batch near-dup of A (id 5) → 5 dropped
    mem.addData((1L, docA), (2L, docB), (5L, docATrunc))
    q.processAllAvailable()
    // batch 2: a CROSS-batch near-dup of A (id 7) and a fresh doc (id 8)
    mem.addData((7L, docATrunc), (8L, docD))
    q.processAllAvailable(); q.stop()
    val accepted = spark.read.parquet(s"$base/corpus")
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(accepted.toSeq === Seq(1L, 2L, 8L))
    // the index holds bands for exactly the accepted docs
    val idxIds = spark.read.parquet(s"$base/index")
      .select($"id").distinct().collect().map(_.getLong(0)).sorted
    assert(idxIds.toSeq === Seq(1L, 2L, 8L))
  }

  test("winnowIngest drops guaranteed-recall near-dups across and within batches") {
    val base = java.nio.file.Files.createTempDirectory("graft_wni").toString
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.winnowIngest(
      mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$base/corpus", s"$base/index", s"$base/ckpt")
    val docA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val docB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val docATrunc = (1 to 32).map(i => s"alpha$i").mkString(" ")
    val docD = (1 to 40).map(i => s"delta$i").mkString(" ")
    // batch 1: A, B, and a within-batch truncation of A (id 5) → 5 dropped
    mem.addData((1L, docA), (2L, docB), (5L, docATrunc))
    q.processAllAvailable()
    // batch 2: a cross-batch truncation of A (id 7; 32 shared tokens ≫
    // w+k−1 = 8, so the drop is guaranteed, not probabilistic) + fresh 8
    mem.addData((7L, docATrunc), (8L, docD))
    q.processAllAvailable(); q.stop()
    val accepted = spark.read.parquet(s"$base/corpus")
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(accepted.toSeq === Seq(1L, 2L, 8L))
    // the index holds fingerprints for exactly the accepted docs
    val idxIds = spark.read.parquet(s"$base/index")
      .select($"id").distinct().collect().map(_.getLong(0)).sorted
    assert(idxIds.toSeq === Seq(1L, 2L, 8L))
  }

  test("fuzzyDedupIngest: streamed outcome equals batch fuzzy dedup over the union") {
    val base = java.nio.file.Files.createTempDirectory("graft_fdi").toString
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.fuzzyDedupIngest(
      mem.toDF().toDF("rec_id", "key"),
      "rec_id", "key", s"$base/corpus", s"$base/index", s"$base/ckpt",
      maxDist = 2)
    val b1 = Seq((1L, "the quick brown fox jumps"),
      (2L, "an entirely different key!!"),
      (5L, "the quick briwn fox jumps"))   // within-batch typo of 1
    val b2 = Seq((7L, "the quick brown fox jumpz"), // cross-batch typo of 1
      (8L, "another novel key entirely"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val accepted = spark.read.parquet(s"$base/corpus")
      .select($"rec_id").collect().map(_.getLong(0)).toSet
    val batchKept = graft.llm.Dedup.dropFuzzyDuplicates(
        (b1 ++ b2).toDF("rec_id", "key"), "rec_id", "key", maxDist = 2)
      .select($"rec_id").collect().map(_.getLong(0)).toSet
    assert(accepted === batchKept)
    assert(accepted === Set(1L, 2L, 8L))
    // the key index holds exactly the accepted rows
    val idxIds = spark.read.parquet(s"$base/index")
      .select($"id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxIds === Set(1L, 2L, 8L))
  }

  test("cmsIngest: summed batch deltas equal the batch sketch of the union") {
    val base = java.nio.file.Files.createTempDirectory("graft_cms").toString
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.cmsIngest(
      mem.toDF().toDF("doc_id", "text"), "text",
      s"$base/sketch", s"$base/ckpt", depth = 3, width = 32)
    val b1 = Seq((1L, "x x y"), (2L, "y z z z"))
    val b2 = Seq((3L, "x w w"), (4L, "z y"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val streamed = graft.streaming.Pipelines.cmsCells(spark, s"$base/sketch")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.llm.CorpusStats.countMinSketch(
        (b1 ++ b2).toDF("doc_id", "text"), "text", depth = 3, width = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
  }

  test("hllIngest: max-merged registers give the batch estimate of the union") {
    val base = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val mem = MemoryStream[(String, String)](spark)
    val q = graft.streaming.Pipelines.hllIngest(
      mem.toDF().toDF("g", "v"), "g", "v", s"$base/reg", s"$base/ckpt")
    val b1 = (1 to 300).map(i => ("g", s"t$i"))
    val b2 = (200 to 500).map(i => ("g", s"t$i")) // overlap on purpose
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val merged = graft.streaming.Pipelines.hllRegistersRead(spark, "g",
      s"$base/reg")
    val streamed = graft.llm.Sketches.hllEstimateFromRegisters(merged, "g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.llm.Sketches.hllEstimate(
        (b1 ++ b2).toDF("g", "v"), "g", $"v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
    assert(math.abs(streamed("g") - 500.0) / 500.0 <= 0.15)
  }

  test("btIngest: refit from summed pair deltas equals the batch fit of the union") {
    val base = java.nio.file.Files.createTempDirectory("graft_bt").toString
    val mem = MemoryStream[(String, String)](spark)
    val q = graft.streaming.Pipelines.btIngest(
      mem.toDF().toDF("winner", "loser"), "winner", "loser",
      s"$base/pairs", s"$base/ckpt")
    val b1 = Seq(("a", "b"), ("a", "b"), ("b", "c"))
    val b2 = Seq(("a", "c"), ("c", "b"), ("a", "b"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val merged = graft.streaming.Pipelines.btPairCountsRead(spark,
      s"$base/pairs")
    val streamed = graft.llm.Ranking.btStrengthsFromPairCounts(merged)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.llm.Ranking.btStrengths(
        (b1 ++ b2).toDF("winner", "loser"), "winner", "loser")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
    assert(streamed("a") > streamed("b"))
  }

  test("agreementIngest: κ/α from summed cells equal the batch fit of the union") {
    val base = java.nio.file.Files.createTempDirectory("graft_agr").toString
    val mem = MemoryStream[(String, String)](spark)
    val q = graft.streaming.Pipelines.agreementIngest(
      mem.toDF().toDF("item", "label"), "item", "label",
      s"$base/cells", s"$base/ckpt")
    // 3 items × 4 ratings each, ratings arriving across two batches —
    // the same ITEM receives ratings in both (cells must merge, not
    // just concatenate)
    val b1 = Seq(("i1", "x"), ("i1", "x"), ("i2", "x"), ("i2", "y"),
      ("i3", "y"), ("i3", "y"))
    val b2 = Seq(("i1", "x"), ("i1", "y"), ("i2", "y"), ("i2", "y"),
      ("i3", "y"), ("i3", "x"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val cells = graft.streaming.Pipelines.agreementCellsRead(spark,
      s"$base/cells")
    val union = (b1 ++ b2).toDF("item", "label")
    def one(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.collect().map(_.toSeq).head
    assert(one(graft.llm.Classifier.fleissKappaFromCells(cells,
        "item", "label", "n"))
      === one(graft.llm.Classifier.fleissKappaMicro(union, "item", "label")))
    assert(one(graft.llm.Classifier.krippendorffAlphaFromCells(cells,
        "item", "label", "n"))
      === one(graft.llm.Classifier.krippendorffAlphaMicro(union,
        "item", "label")))
  }

  test("suppressIngest: read-time gate equals batch suppression, retroactive release") {
    val base = java.nio.file.Files.createTempDirectory("graft_sup").toString
    val mem = MemoryStream[(Long, String, String)](spark)
    val q = graft.streaming.Pipelines.suppressIngest(
      mem.toDF().toDF("id", "zip", "age"), Seq("zip", "age"),
      s"$base/rows", s"$base/counts", s"$base/ckpt")
    // group (z1, a) reaches k=2 only across batches — the batch-1 row
    // must be released retroactively; (z9, c) never reaches k; the null
    // QI rows form ONE group that reaches k
    val b1 = Seq((1L, "z1", "a"), (2L, "z9", "c"), (3L, null: String, "a"))
    val b2 = Seq((4L, "z1", "a"), (5L, null: String, "a"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("id").collect().map(_.getLong(0)).toSet
    val released = graft.streaming.Pipelines.suppressedRead(spark,
      s"$base/rows", s"$base/counts", Seq("zip", "age"), k = 2)
    val batch = graft.llm.Privacy.suppressSmallGroups(
      (b1 ++ b2).toDF("id", "zip", "age"), Seq("zip", "age"), k = 2)
    assert(ids(released) === ids(batch))
    assert(ids(released) === Set(1L, 3L, 4L, 5L))
  }

  test("genLadderIngest: width from merged histograms equals the batch ladder pick") {
    val base = java.nio.file.Files.createTempDirectory("graft_gen").toString
    val mem = MemoryStream[(Long, String, Long)](spark)
    val q = graft.streaming.Pipelines.genLadderIngest(
      mem.toDF().toDF("id", "region", "age"), Seq("region"), "age",
      s"$base/hist", s"$base/ckpt", maxExp = 6)
    // within each region, ages pair up only at width 8: singles at finer
    // widths exist in BOTH batches' unions, so the pick must come from
    // the MERGED histogram (each single batch alone would pick wider)
    val b1 = Seq((1L, "r1", 10L), (2L, "r1", 17L), (3L, "r2", 33L))
    val b2 = Seq((4L, "r1", 12L), (5L, "r1", 22L), (6L, "r2", 38L),
      (7L, "r1", 18L), (8L, "r2", 34L), (9L, "r2", 39L))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val streamedW = graft.streaming.Pipelines.genWidthRead(spark,
      s"$base/hist", Seq("region"), k = 2, maxExp = 6)
    val batchW = graft.llm.Privacy.generalizeToK(
        (b1 ++ b2).toDF("id", "region", "age"), Seq("region"), "age",
        k = 2, maxExp = 6)
      .select("gen_width").head().getLong(0)
    assert(streamedW === batchW)
    // and the merged pick is strictly finer than either batch's own pick
    val w1 = graft.llm.Privacy.genWidthFromHist(
      graft.llm.Privacy.genLadderHist(b1.toDF("id", "region", "age"),
        Seq("region"), "age", maxExp = 6), Seq("region"), 2, maxExp = 6)
    assert(streamedW <= w1)
  }

  test("manifestIngest: merged per-batch manifests equal the batch manifest of the union") {
    val base = java.nio.file.Files.createTempDirectory("graft_mf").toString
    val mem = MemoryStream[(Long, Long, String)](spark)
    val q = graft.streaming.Pipelines.manifestIngest(
      mem.toDF().toDF("shard", "doc_id", "text"), "shard", "doc_id", "text",
      s"$base/manifest", s"$base/ckpt")
    val b1 = Seq((0L, 1L, "a b"), (1L, 2L, "c d e"))
    val b2 = Seq((0L, 3L, "f"), (1L, 4L, "g h"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val streamed = asMap(graft.streaming.Pipelines.manifestRead(spark,
      "shard", s"$base/manifest"))
    val batch = asMap(graft.llm.CorpusStats.shardManifest(
      (b1 ++ b2).toDF("shard", "doc_id", "text"), "shard", "doc_id",
      "text"))
    assert(streamed === batch)
  }

  test("imageDedupIngest drops perceptual dups across and within batches") {
    import graft.llm.ImageHash
    val base = java.nio.file.Files.createTempDirectory("graft_idi").toString
    val mem = MemoryStream[(Long, Array[Byte])](spark)
    val q = graft.streaming.Pipelines.imageDedupIngest(
      mem.toDF().toDF("media_id", "media"),
      "media_id", "media", s"$base/corpus", s"$base/index", s"$base/ckpt")
    // batch 1: scenes 1, 2, and a JPEG rendition of 1 (id 5) → 5 dropped
    mem.addData((1L, ImageHash.synthPng(100L, 64, 48)),
      (2L, ImageHash.synthPng(200L, 64, 48)),
      (5L, ImageHash.synthJpeg(100L, 96, 72)))
    q.processAllAvailable()
    // batch 2: a cross-batch rendition of scene 2 + a fresh scene + junk
    mem.addData((7L, ImageHash.synthJpeg(200L, 96, 72)),
      (8L, ImageHash.synthPng(300L, 64, 48)),
      (9L, Array[Byte](1, 2, 3)))
    q.processAllAvailable(); q.stop()
    val accepted = spark.read.parquet(s"$base/corpus")
      .select($"media_id").collect().map(_.getLong(0)).sorted
    assert(accepted.toSeq === Seq(1L, 2L, 8L, 9L))
    // the hash index holds exactly the accepted DECODED media
    val idxIds = spark.read.parquet(s"$base/index")
      .select($"id").distinct().collect().map(_.getLong(0)).sorted
    assert(idxIds.toSeq === Seq(1L, 2L, 8L))
  }

  test("audioDedupIngest: streamed outcome equals batch dedup over the union") {
    import graft.llm.AudioHash
    val base = java.nio.file.Files.createTempDirectory("graft_adi").toString
    val mem = MemoryStream[(Long, Array[Byte])](spark)
    val q = graft.streaming.Pipelines.audioDedupIngest(
      mem.toDF().toDF("media_id", "media"),
      "media_id", "media", s"$base/corpus", s"$base/index", s"$base/ckpt")
    val b1 = Seq((1L, AudioHash.synthWav(100L, 44100)),
      (2L, AudioHash.synthWav(200L, 44100)),
      (5L, AudioHash.synthWav(100L, 22050, volumeMilli = 700)))
    val b2 = Seq((7L, AudioHash.synthWav(200L, 22050, channels = 2)),
      (8L, AudioHash.synthWav(300L, 44100)))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val accepted = spark.read.parquet(s"$base/corpus")
      .select($"media_id").collect().map(_.getLong(0)).toSet
    // min-id-survivor batch semantics over the union: streamed arrival
    // order coincides with id order here, so outcomes must be identical
    val batchKept = AudioHash.dropNearDuplicates(
        (b1 ++ b2).toDF("media_id", "media"), "media_id", "media")
      .select($"media_id").collect().map(_.getLong(0)).toSet
    assert(accepted === batchKept)
    assert(accepted === Set(1L, 2L, 8L))
  }

  test("winnowNearDupsIncremental equals the batch recompute's fresh-touching pairs") {
    import graft.llm.Dedup
    val mk = (tag: String, n: Int) => (1 to n).map(i => s"$tag$i").mkString(" ")
    val existing = Seq((1L, mk("a", 30)), (2L, mk("b", 30))).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, mk("a", 24)),  // near-dup of existing 1
      (11L, mk("c", 30)),  // novel
      (12L, mk("c", 24))   // within-batch near-dup of 11
    ).toDF("doc_id", "text")
    val index = Dedup.winnowFingerprintIndex(existing, "doc_id", "text")
    val (pairs, freshFp) = Dedup.winnowNearDupsIncremental(
      index, fresh, "doc_id", "text")
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Dedup.winnowNearDupPairs(
        existing.unionByName(fresh), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(p => p._1 >= 10L || p._2 >= 10L).toSet
    assert(got === full)
    assert(got.exists(p => p._1 === 1L && p._2 === 10L))
    assert(got.exists(p => p._1 === 11L && p._2 === 12L))
    // fresh index rows cover exactly the fresh ids
    assert(freshFp.select($"id").distinct().collect().map(_.getLong(0)).sorted
      .toSeq === Seq(10L, 11L, 12L))
  }

  test("boilerplateIngest cuts spans that become frequent across batches") {
    val base = java.nio.file.Files.createTempDirectory("graft_bpi").toString
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.boilerplateIngest(
      mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$base/clean", s"$base/index", s"$base/ckpt",
      spanTokens = 4, maxDf = 3)
    val footer = (1 to 4).map(i => s"f$i").mkString(" ")
    // batch 1: footer df=3 ≤ maxDf → everything kept verbatim
    mem.addData((1 to 3).map(i => (i.toLong, s"one$i two$i $footer")): _*)
    q.processAllAvailable()
    // batch 2: merged footer df=6 > 3 → cut from batch-2 docs only
    mem.addData((4 to 6).map(i => (i.toLong, s"one$i two$i $footer")): _*)
    q.processAllAvailable(); q.stop()
    val out = spark.read.parquet(s"$base/clean")
      .select($"doc_id", $"n_removed", $"clean_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(out.length === 6)
    out.filter(_._1 <= 3).foreach { case (id, nRem, text) =>
      assert(nRem === 0L && text.endsWith(footer), s"batch-1 doc $id changed")
    }
    out.filter(_._1 >= 4).foreach { case (id, nRem, text) =>
      assert(nRem === 4L && text === s"one$id two$id", s"doc $id kept footer")
    }
    // the persisted index resolves to the union's frequencies (via the
    // two-level read path — raw partition sums double-count once a
    // compacted base exists)
    val df = graft.streaming.Pipelines.readSpanDfIndex(spark, s"$base/index")
      .agg(max($"span_df")).head().getLong(0)
    assert(df === 6L)
  }

  test("datacardIngest: panel from merged state equals the batch panel " +
      "over the union") {
    val base = java.nio.file.Files.createTempDirectory("graft_dci").toString
    val mem = MemoryStream[(Long, String, String)](spark)
    // a reader racing the first batch sees an EMPTY panel, not a crash
    assert(graft.streaming.Pipelines.datacardRead(spark,
      s"$base/stats", s"$base/ltf").count() === 0L)
    val q = graft.streaming.Pipelines.datacardIngest(
      mem.toDF().toDF("doc_id", "text", "lang"), "doc_id", "text", "lang",
      s"$base/stats", s"$base/ltf", s"$base/ckpt")
    val b1 = Seq(
      (1L, "alpha beta alpha gamma", "en"),
      (2L, "un deux trois un", "fr"),
      (3L, "кириллица текст здесь", "ru"))
    val b2 = Seq(
      (4L, "alpha alpha beta delta epsilon beta", "en"),
      (5L, "quatre cinq un un deux", "fr"),
      (6L, "alpha beta gamma delta", "en"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val streamed = img(graft.streaming.Pipelines.datacardRead(spark,
      s"$base/stats", s"$base/ltf"))
    // the panel from merged slim state must be bit-identical (incl. the
    // exact-decimal mean and the integer micro legs) to the batch panel
    // over the union — text tokenized once, at ingestion
    val union = (b1 ++ b2).toDF("doc_id", "text", "lang")
    val batch = img(graft.llm.CorpusStats.datacardPanel(
      graft.llm.CorpusStats.datacardDocStats(union, "doc_id", "text", "lang"),
      graft.llm.CorpusStats.langTokenFreqs(union, "text", "lang")))
    assert(streamed === batch)
    // sanity on the legs: ru is non-latin-dominant; en's Zipf head decays
    val byLang = streamed.map(r => r.head -> r).toMap
    assert(byLang("ru")(7) === 1L) // n_nonlatin_dom
    assert(byLang("en")(9).asInstanceOf[Long] > 0L) // zipf_alpha_micro
  }

  test("semDedupIngest: streamed survivors equal semDedupFrozen over the " +
      "union; drop chains cross batches through non-survivor state") {
    val base = java.nio.file.Files.createTempDirectory("graft_sdi").toString
    // frozen 2-cell centroid table (the intCentroidTable contract: a
    // per-batch-trained quantizer would shift cells as the corpus grows)
    val cents = Seq((0, Seq(127, 0, 0, 0, 0, 0, 0, 0)),
      (1, Seq(0, 127, 0, 0, 0, 0, 0, 0))).toDF("cid", "q")
    def v(x: Double*): Seq[Double] = x ++ Seq.fill(8 - x.size)(0.0)
    val mem = MemoryStream[(Long, Seq[Double])](spark)
    val q = graft.streaming.Pipelines.semDedupIngest(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, 0.99, s"$base/clean", s"$base/idx", s"$base/ckpt")
    // quantized sims: cos(a,b) = cos(b,c) ≈ 0.995 ≥ t, cos(a,c) ≈ 0.979
    // < t — so c's ONLY dropper is b, and b itself drops vs a: cutting c
    // in batch 2 REQUIRES the state to carry the non-survivor b
    val b1 = Seq(
      (1L, v(1.0, 0.1)),   // a — chain head, survives
      (2L, v(1.0, 0.0)),   // b — drops vs a
      (10L, v(0.0, 1.0)))  // cell-1 original, survives
    val b2 = Seq(
      (3L, v(1.0, -0.1)),  // c — drops vs the already-dropped b
      (11L, v(0.0, 1.0)),  // exact cross-batch dup of 10 → drops
      (12L, v(0.3, 0.3)))  // equidistant tie → cell 0, no near-dup → survives
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val streamed = spark.read.parquet(s"$base/clean")
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val union = (b1 ++ b2).toDF("vec_id", "embedding")
    val batch = graft.llm.Similarity.semDedupFrozen(union, cents, 0.99)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(streamed === batch)
    assert(streamed === Set(1L, 10L, 12L),
      s"chain/dup semantics drifted: $streamed")
    // the persisted state carries EVERY ingested vector, not survivors
    assert(graft.streaming.Pipelines.readSemDedupState(spark, s"$base/idx")
      .count() === 6L)
  }

  test("datacardIngest with a FROZEN tokenizer streams the fertility leg " +
      "bit-identically") {
    val base = java.nio.file.Files.createTempDirectory("graft_dcf").toString
    // freeze a piece table trained on a fixed reference corpus — frozen is
    // the mergeable-form requirement: a corpus-trained table drifts with
    // every batch, a fixed broadcast table gives additive per-doc counts
    val ref = Seq((0L, "alpha beta gamma delta un deux trois un alpha"))
      .toDF("doc_id", "text")
    val pieces = graft.llm.Tokenizer.unigramPieces(ref, "text", 16)
    val mem = MemoryStream[(Long, String, String)](spark)
    val q = graft.streaming.Pipelines.datacardIngest(
      mem.toDF().toDF("doc_id", "text", "lang"), "doc_id", "text", "lang",
      s"$base/stats", s"$base/ltf", s"$base/ckpt",
      frozenPieces = Some(pieces))
    val b1 = Seq(
      (1L, "alpha beta alpha gamma", "en"),
      (2L, "un deux trois un", "fr"))
    val b2 = Seq(
      (3L, "alpha alpha beta delta epsilon beta", "en"),
      (4L, "quatre cinq un un deux", "fr"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val panel = graft.streaming.Pipelines.datacardRead(spark,
      s"$base/stats", s"$base/ltf")
    assert(panel.columns.last === "fertility_micro",
      s"frozen-tokenizer panel must carry fertility: ${panel.columns.toSeq}")
    val streamed = img(panel)
    // FULL-panel bit-identity incl. fertility vs the batch panel with the
    // same frozen table over the union (r10 VERDICT ask #3)
    val union = (b1 ++ b2).toDF("doc_id", "text", "lang")
    val batch = img(graft.llm.CorpusStats.datacardPanel(
      graft.llm.CorpusStats.datacardDocStats(union, "doc_id", "text", "lang",
        Some(pieces)),
      graft.llm.CorpusStats.langTokenFreqs(union, "text", "lang")))
    assert(streamed === batch)
    // fertility is real: at least one piece per word → micro ratio ≥ 1e6
    streamed.foreach { r =>
      assert(r(11).asInstanceOf[Long] >= 1000000L,
        s"fertility_micro must be >= 1e6: $r")
    }
  }

  test("substringDedupIngest: streamed union equals the batch ExactSubstr cut") {
    val base = java.nio.file.Files.createTempDirectory("graft_ssi").toString
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.substringDedupIngest(
      mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$base/clean", s"$base/index", s"$base/ckpt",
      minRunTokens = 4)
    val run = (1 to 5).map(i => s"r$i").mkString(" ") // 5-token shared run
    val b1 = Seq(
      (1L, s"a1 b1 $run c1"), // lowest-id owner → kept verbatim
      (2L, s"a2 $run b2")) // within-batch dup → run cut
    val b2 = Seq(
      (3L, s"x3 $run y3"), // cross-batch dup vs the keeper index → cut
      (4L, "u4 v4 w4 z4 q4")) // unique → untouched
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    def img(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_tokens", $"n_removed", $"clean_text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val streamed = img(spark.read.parquet(s"$base/clean"))
    // batch ids increase across batches, so the streamed output must be
    // byte-identical to the batch operator over the whole union
    val batch = img(graft.llm.CorpusStats.removeDuplicateSubstrings(
      (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text",
      minRunTokens = 4))
    assert(streamed === batch)
    val byId = streamed.map(t => t._1 -> t._3).toMap
    assert(byId === Map(1L -> 0L, 2L -> 5L, 3L -> 5L, 4L -> 0L))
    // the persisted keeper state resolves to the union's index
    val resolved = graft.streaming.Pipelines
      .readSubstrIndex(spark, s"$base/index")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val full = graft.llm.CorpusStats.substrKeeperIndex(
      (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text",
      minRunTokens = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(resolved === full)
  }

  test("substringDedupIngest KILLED between micro-batches resumes from " +
      "the persisted index (mid-stream kill-and-resume capstone)") {
    // the r11 batch capstone (JobSpec) proves config pipelines resume
    // between durable steps; this one kills an INGEST LOOP mid-stream:
    // stop the query after batch 0, re-open a NEW query from the same
    // checkpoint + base/delta index dirs, and require (a) the old drop
    // is not replayed, (b) cross-batch dedup still sees batch-0 state —
    // i.e. the loop's memory genuinely lives in the persisted index, not
    // in the stopped query's JVM state
    val in = java.nio.file.Files.createTempDirectory("graft_ssk_in")
    val base = java.nio.file.Files.createTempDirectory("graft_ssk").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def start() = graft.streaming.Pipelines.substringDedupIngest(
      spark.readStream.schema(schema).json(in.toString + "/*.ndjson"),
      "doc_id", "text", s"$base/clean", s"$base/index", s"$base/ckpt",
      minRunTokens = 4)
    def drop(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(in.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes("UTF-8"))
    val run = (1 to 5).map(i => s"r$i").mkString(" ")
    val b1 = Seq((1L, s"a1 b1 $run c1"), (2L, s"a2 $run b2"))
    val b2 = Seq((3L, s"x3 $run y3"), (4L, "u4 v4 w4 z4 q4"))
    val b3 = Seq((5L, s"k5 $run m5"))
    drop("a.ndjson", b1)
    val q1 = start(); q1.processAllAvailable(); q1.stop() // the kill
    drop("b.ndjson", b2)
    val q2 = start() // re-open from checkpoint + persisted index
    q2.processAllAvailable()
    drop("c.ndjson", b3)
    q2.processAllAvailable(); q2.stop()
    def img(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_tokens", $"n_removed", $"clean_text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val streamed = spark.read.parquet(s"$base/clean")
    // (a) no replay: the killed batch's docs appear exactly once
    assert(streamed.groupBy($"doc_id").count()
      .filter($"count" > 1).count() === 0,
      "resume replayed an already-committed micro-batch")
    // (b) final state ≡ one uninterrupted run ≡ the batch operator
    val batch = img(graft.llm.CorpusStats.removeDuplicateSubstrings(
      (b1 ++ b2 ++ b3).toDF("doc_id", "text"), "doc_id", "text",
      minRunTokens = 4))
    assert(img(streamed) === batch)
    // docs 3 and 5 deduplicate against BATCH-0 state that only the
    // persisted index could have carried across the kill
    val removed = img(streamed).map(t => t._1 -> t._3).toMap
    assert(removed === Map(1L -> 0L, 2L -> 5L, 3L -> 5L, 4L -> 0L,
      5L -> 5L))
    // the resolved keeper index equals the batch index of the union
    val resolved = graft.streaming.Pipelines
      .readSubstrIndex(spark, s"$base/index")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val full = graft.llm.CorpusStats.substrKeeperIndex(
      (b1 ++ b2 ++ b3).toDF("doc_id", "text"), "doc_id", "text",
      minRunTokens = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(resolved === full)
  }

  // ---------------- deletion propagation beyond DSIR (r13 ask #4) ----

  test("forgetTermDf: exact subtraction equals batch-over-survivors; the " +
      "durable fold composes with continued ingestion") {
    import graft.llm.CorpusStats
    import graft.streaming.Pipelines
    val in = java.nio.file.Files.createTempDirectory("graft_tfg_in")
    val base = java.nio.file.Files.createTempDirectory("graft_tfg").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def start() = Pipelines.tfidfIngest(
      spark.readStream.schema(schema).json(in.toString + "/*.ndjson"),
      "doc_id", "text", s"$base/kw", s"$base/idx", s"$base/ckpt", 3)
    def drop(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(in.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes("UTF-8"))
    val b1 = Seq((1L, "shared words alpha beta"),
      (2L, "shared words gamma delta"),
      (3L, "unique trio epsilon"))
    val b2 = Seq((4L, "shared zeta eta"), (5L, "alpha beta theta"))
    drop("a.ndjson", b1)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    drop("b.ndjson", b2)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // forget docs 2 and 4 — their ORIGINAL rows, the caller-supplied form
    val gone = Seq(b1(1), b2.head).toDF("doc_id", "text")
    val survivors = (b1 ++ b2).filterNot(r => r._1 == 2L || r._1 == 4L)
      .toDF("doc_id", "text")
    // read-time form: corrected view, state untouched
    val corrected = Pipelines.forgetTermDf(spark, s"$base/idx",
      gone, "doc_id", "text")
    assert(img(corrected) ===
      img(CorpusStats.termDfIndex(survivors, "doc_id", "text")))
    assert(img(Pipelines.readTermDfIndex(spark, s"$base/idx")) ===
      img(CorpusStats.termDfIndex((b1 ++ b2).toDF("doc_id", "text"),
        "doc_id", "text")), "read-time forget must not touch state")
    // durable form: the fold rewrites the index, the reader agrees
    Pipelines.forgetTermDf(spark, s"$base/idx", gone, "doc_id", "text",
      persist = true)
    assert(img(Pipelines.readTermDfIndex(spark, s"$base/idx")) ===
      img(CorpusStats.termDfIndex(survivors, "doc_id", "text")))
    // composition: the loop resumes from the same checkpoint and the
    // resolved index is survivors ∪ the new batch — the fold is a real
    // base the two-level layout keeps building on
    val b3 = Seq((6L, "shared words iota"), (7L, "fresh kappa"))
    drop("c.ndjson", b3)
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    assert(img(Pipelines.readTermDfIndex(spark, s"$base/idx")) ===
      img(CorpusStats.termDfIndex(
        survivors.unionByName(b3.toDF("doc_id", "text")),
        "doc_id", "text")))
  }

  test("forgetSpanDf / forgetParaDf / forgetLtf: exact subtraction equals " +
      "batch-over-survivors, read-time and durable") {
    import graft.llm.CorpusStats
    import graft.streaming.Pipelines
    val foot = "f1 f2 f3 f4"
    val b1 = Seq((1L, s"alpha beta gamma delta\n$foot", "en"),
      (2L, s"un deux trois quatre\n$foot", "fr"))
    val b2 = Seq((4L, s"epsilon zeta eta theta\n$foot", "en"),
      (5L, "cinq six sept huit", "fr"))
    val goneIds = Set(2L, 4L)
    val survivors = (b1 ++ b2).filterNot(r => goneIds(r._1))
    val gone2 = (b1 ++ b2).filter(r => goneIds(r._1))
    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // one loop per family over the same two batches
    val sb = java.nio.file.Files.createTempDirectory("graft_sfg").toString
    val pb = java.nio.file.Files.createTempDirectory("graft_pfg").toString
    val db = java.nio.file.Files.createTempDirectory("graft_dfg").toString
    val memS = MemoryStream[(Long, String)](spark)
    val qS = Pipelines.boilerplateIngest(memS.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$sb/out", s"$sb/idx", s"$sb/ckpt", 4, 2)
    val memP = MemoryStream[(Long, String)](spark)
    val qP = Pipelines.paraDedupIngest(memP.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$pb/out", s"$pb/idx", s"$pb/ckpt", 2)
    val memD = MemoryStream[(Long, String, String)](spark)
    val qD = Pipelines.datacardIngest(
      memD.toDF().toDF("doc_id", "text", "lang"), "doc_id", "text", "lang",
      s"$db/stats", s"$db/ltf", s"$db/ckpt")
    for (b <- Seq(b1, b2)) {
      memS.addData(b.map(r => (r._1, r._2)): _*); qS.processAllAvailable()
      memP.addData(b.map(r => (r._1, r._2)): _*); qP.processAllAvailable()
      memD.addData(b: _*); qD.processAllAvailable()
    }
    qS.stop(); qP.stop(); qD.stop()
    val goneDf = gone2.map(r => (r._1, r._2)).toDF("doc_id", "text")
    val survDf = survivors.map(r => (r._1, r._2)).toDF("doc_id", "text")
    // span-df
    assert(img(Pipelines.forgetSpanDf(spark, s"$sb/idx", goneDf,
        "doc_id", "text", 4)) ===
      img(CorpusStats.spanDfIndex(survDf, "doc_id", "text", 4)))
    Pipelines.forgetSpanDf(spark, s"$sb/idx", goneDf, "doc_id", "text", 4,
      persist = true)
    assert(img(Pipelines.readSpanDfIndex(spark, s"$sb/idx")) ===
      img(CorpusStats.spanDfIndex(survDf, "doc_id", "text", 4)))
    // para-df
    assert(img(Pipelines.forgetParaDf(spark, s"$pb/idx", goneDf,
        "doc_id", "text")) ===
      img(CorpusStats.paraDfIndex(survDf, "doc_id", "text")))
    Pipelines.forgetParaDf(spark, s"$pb/idx", goneDf, "doc_id", "text",
      persist = true)
    assert(img(Pipelines.readParaDfIndex(spark, s"$pb/idx")) ===
      img(CorpusStats.paraDfIndex(survDf, "doc_id", "text")))
    // ltf (datacard frequency leg)
    val goneLang = gone2.toDF("doc_id", "text", "lang").drop("doc_id")
    val survLang = survivors.toDF("doc_id", "text", "lang").drop("doc_id")
    assert(img(Pipelines.forgetLtf(spark, s"$db/ltf", goneLang,
        "text", "lang")) ===
      img(CorpusStats.langTokenFreqs(survLang, "text", "lang")))
    Pipelines.forgetLtf(spark, s"$db/ltf", goneLang, "text", "lang",
      persist = true)
    assert(img(Pipelines.readLtfIndex(spark, s"$db/ltf")) ===
      img(CorpusStats.langTokenFreqs(survLang, "text", "lang")))
  }

  test("forgetBm25Df: exact subtraction equals batch-over-survivors " +
      "INCLUDING the sentinel totals; the durable fold composes with " +
      "continued ingestion; an un-ingested forget raises") {
    import graft.llm.Retrieval
    import graft.streaming.Pipelines
    val in = java.nio.file.Files.createTempDirectory("graft_bfg_in")
    val base = java.nio.file.Files.createTempDirectory("graft_bfg").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val queries = Seq("qa" -> "shared alpha")
    def start() = Pipelines.bm25Ingest(
      spark.readStream.schema(schema).json(in.toString + "/*.ndjson"),
      "doc_id", "text", queries, s"$base/scores", s"$base/idx",
      s"$base/ckpt", 3)
    def drop(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(in.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes("UTF-8"))
    val b1 = Seq((1L, "shared words alpha beta"),
      (2L, "shared words gamma delta"),
      (3L, "unique trio epsilon"))
    val b2 = Seq((4L, "shared zeta eta"), (5L, "alpha beta theta"))
    drop("a.ndjson", b1)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    drop("b.ndjson", b2)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val gone = Seq(b1(1), b2.head).toDF("doc_id", "text")
    val survivors = (b1 ++ b2).filterNot(r => r._1 == 2L || r._1 == 4L)
      .toDF("doc_id", "text")
    // read-time form: corrected view equals the batch index over
    // survivors — per-term dfs AND the ' N '/' T ' sentinel totals
    val corrected = Pipelines.forgetBm25Df(spark, s"$base/idx",
      gone, "doc_id", "text")
    assert(img(corrected) ===
      img(Retrieval.bm25Index(survivors, "doc_id", "text")))
    val sentinels = corrected
      .filter(col("term").isin(Retrieval.DocCountKey, Retrieval.TokenCountKey))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sentinels(Retrieval.DocCountKey) === 3L)
    assert(sentinels(Retrieval.TokenCountKey) === 10L,
      "token total must drop by exactly the forgotten docs' lengths")
    assert(img(Pipelines.readBm25Index(spark, s"$base/idx")) ===
      img(Retrieval.bm25Index((b1 ++ b2).toDF("doc_id", "text"),
        "doc_id", "text")), "read-time forget must not touch state")
    // the corrected index SCORES like the survivor corpus: fresh docs
    // ranked against it get batch-identical BM25 aggregates
    val fresh = Seq((9L, "alpha shared probe")).toDF("doc_id", "text")
    assert(img(Retrieval.bm25ScoreAgainstIndex(fresh, "doc_id", "text",
        queries, corrected)) ===
      img(Retrieval.bm25ScoreAgainstIndex(fresh, "doc_id", "text", queries,
        Retrieval.bm25Index(survivors, "doc_id", "text"))))
    // durable form + composition with continued ingestion
    Pipelines.forgetBm25Df(spark, s"$base/idx", gone, "doc_id", "text",
      persist = true)
    assert(img(Pipelines.readBm25Index(spark, s"$base/idx")) ===
      img(Retrieval.bm25Index(survivors, "doc_id", "text")))
    val b3 = Seq((6L, "shared words iota"), (7L, "fresh kappa"))
    drop("c.ndjson", b3)
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    assert(img(Pipelines.readBm25Index(spark, s"$base/idx")) ===
      img(Retrieval.bm25Index(
        survivors.unionByName(b3.toDF("doc_id", "text")),
        "doc_id", "text")))
    // r14 ADVICE red case: forgetting rows that were NEVER ingested
    // drives a count negative — the subtraction must raise, not clamp.
    // Three fabricated docs all containing "alpha" subtract df(alpha)=3
    // from an index where only 2 surviving docs carry it.
    val alien = Seq((101L, "alpha beta"), (102L, "alpha beta"),
      (103L, "alpha beta")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Pipelines.forgetBm25Df(spark, s"$base/idx", alien, "doc_id", "text")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("forgetAdditiveIndex")), e.toString)
  }

  test("foldAsNewBase crash safety: a leftover .forget_old fails the " +
      "next fold loudly with recovery instructions; a clean fold leaves " +
      "no hidden dirs behind") {
    import graft.streaming.Pipelines
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tb = java.nio.file.Files.createTempDirectory("graft_fcw").toString
    val mem = MemoryStream[(Long, String)](spark)
    val q = Pipelines.tfidfIngest(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$tb/kw", s"$tb/idx", s"$tb/ckpt", 3)
    mem.addData((1L, "alpha beta"), (2L, "beta gamma"))
    q.processAllAvailable(); q.stop()
    val gone = Seq((2L, "beta gamma")).toDF("doc_id", "text")
    // in-place durable fold (lone-base state after this): afterwards the
    // index dir must contain ONLY batch= partitions — both hidden swap
    // dirs cleaned up
    Pipelines.forgetTermDf(spark, s"$tb/idx", gone, "doc_id", "text",
      persist = true)
    Pipelines.forgetTermDf(spark, s"$tb/idx",
      spark.emptyDataFrame.selectExpr("CAST(1 AS LONG) AS doc_id",
        "'x' AS text").limit(0), "doc_id", "text", persist = true)
    val dir = new java.io.File(s"$tb/idx")
    assert(!dir.listFiles().exists(_.getName.startsWith(".forget")),
      dir.listFiles().map(_.getName).mkString(", "))
    // a prior fold crashed between rename-aside and install: .forget_old
    // exists — the next fold must refuse with recovery instructions, NOT
    // sweep the only surviving copy of the old base away
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$tb/idx/.forget_old"))
    val e = intercept[RuntimeException] {
      Pipelines.forgetTermDf(spark, s"$tb/idx",
        Seq((1L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text",
        persist = true)
    }
    assert(e.getMessage.contains("crashed mid-swap") &&
      e.getMessage.contains("Recover manually"), e.getMessage)
    // read-time forms keep working around the quarantined dir
    assert(Pipelines.forgetTermDf(spark, s"$tb/idx",
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().isEmpty)
  }

  test("recomputeSubstrIndex: the keeper index is rebuilt over survivors " +
      "(min-id reassignment subtraction cannot express) and keeps composing") {
    import graft.llm.CorpusStats
    import graft.streaming.Pipelines
    val in = java.nio.file.Files.createTempDirectory("graft_krc_in")
    val base = java.nio.file.Files.createTempDirectory("graft_krc").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def start() = Pipelines.substringDedupIngest(
      spark.readStream.schema(schema).json(in.toString + "/*.ndjson"),
      "doc_id", "text", s"$base/clean", s"$base/idx", s"$base/ckpt",
      minRunTokens = 4)
    def drop(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(in.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes("UTF-8"))
    val run = (1 to 5).map(i => s"r$i").mkString(" ")
    // doc 1 is the min-id KEEPER of the shared run — forgetting IT is
    // exactly the case subtraction cannot express (keep_id must move)
    val b1 = Seq((1L, s"a1 $run b1"), (2L, s"a2 $run b2"))
    val b2 = Seq((3L, s"x3 $run y3"), (4L, "u4 v4 w4 z4"))
    drop("a.ndjson", b1)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    drop("b.ndjson", b2)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val survivors = (b1 ++ b2).filterNot(_._1 == 1L).toDF("doc_id", "text")
    // read-time: rebuilt view only
    assert(img(Pipelines.recomputeSubstrIndex(spark, s"$base/idx",
        survivors, "doc_id", "text", 4)) ===
      img(CorpusStats.substrKeeperIndex(survivors, "doc_id", "text", 4)))
    // durable: fold, reader agrees, keep_id of the shared run moved 1→2
    Pipelines.recomputeSubstrIndex(spark, s"$base/idx", survivors,
      "doc_id", "text", 4, persist = true)
    val rebuilt = Pipelines.readSubstrIndex(spark, s"$base/idx")
    assert(img(rebuilt) ===
      img(CorpusStats.substrKeeperIndex(survivors, "doc_id", "text", 4)))
    assert(rebuilt.filter($"keep_id" === 1L).count() === 0L)
    assert(rebuilt.filter($"keep_id" === 2L).count() > 0L)
    // composition: the loop resumes and the rebuilt base keeps merging
    val b3 = Seq((5L, s"k5 $run m5"), (6L, "n6 o6 p6 q6"))
    drop("c.ndjson", b3)
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    assert(img(Pipelines.readSubstrIndex(spark, s"$base/idx")) ===
      img(CorpusStats.substrKeeperIndex(
        survivors.unionByName(b3.toDF("doc_id", "text")),
        "doc_id", "text", 4)))
  }

  test("recomputeNearDupIndex: the band index is rebuilt over survivors " +
      "(greedy displacement is non-invertible), forgotten docs stop " +
      "shadowing, and the loop keeps composing") {
    import graft.llm.Dedup
    import graft.streaming.Pipelines
    val (sh, nh, bd) = (3, 96, 48) // nearDupIngest's own defaults
    val in = java.nio.file.Files.createTempDirectory("graft_ndr_in")
    val base = java.nio.file.Files.createTempDirectory("graft_ndr").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def start() = Pipelines.nearDupIngest(
      spark.readStream.schema(schema).json(in.toString + "/*.ndjson"),
      "doc_id", "text", s"$base/corpus", s"$base/idx", s"$base/ckpt",
      sh, nh, bd, 0.5)
    def drop(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(in.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes("UTF-8"))
    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    def acceptedIds = spark.read.parquet(s"$base/corpus")
      .select($"doc_id".cast("long")).collect().map(_.getLong(0)).toSet
    val dupA = "alpha beta gamma delta eps zeta"
    val dupB = "one two three four five six"
    // batch 1: doc 2 displaced by 1; batch 2: doc 3 dropped against the
    // index of survivor 1, doc 4 unique
    drop("a.ndjson", Seq((1L, dupA), (2L, dupA)))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    drop("b.ndjson", Seq((3L, dupA), (4L, dupB)))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(acceptedIds === Set(1L, 4L))
    // forget survivor 1: docs 2 and 3 it displaced STAY dropped (their
    // text was never accepted — greedy semantics are not replayed); the
    // surviving corpus is doc 4 alone
    val survivors = Seq((4L, dupB)).toDF("doc_id", "text")
    // read-time: rebuilt view only, state untouched
    assert(img(Pipelines.recomputeNearDupIndex(spark, s"$base/idx",
        survivors, "doc_id", "text", sh, nh, bd)) ===
      img(Dedup.minhashBandIndex(survivors, "doc_id", "text", sh, nh, bd)))
    assert(spark.read.parquet(s"$base/idx").where($"id" === 1L).count() > 0)
    // durable: fold as the new base — survivor 1's bands are gone
    Pipelines.recomputeNearDupIndex(spark, s"$base/idx", survivors,
      "doc_id", "text", sh, nh, bd, persist = true)
    val rebuilt = spark.read.parquet(s"$base/idx")
      .select("id", "band", "bucket")
    assert(img(rebuilt) ===
      img(Dedup.minhashBandIndex(survivors, "doc_id", "text", sh, nh, bd)))
    assert(rebuilt.where($"id" === 1L).count() === 0L)
    // composition: the loop resumes against the rebuilt base. Doc 5
    // duplicates the FORGOTTEN doc 1 — accepted now, even though doc 1's
    // text is still resident in the corpus dir (the index is the
    // similarity state; unindexed corpus rows are unreachable as
    // candidates). Doc 6 duplicates the still-surviving doc 4 — dropped.
    drop("c.ndjson", Seq((5L, dupA), (6L, dupB)))
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    assert(acceptedIds === Set(1L, 4L, 5L))
    val after = Seq((4L, dupB), (5L, dupA)).toDF("doc_id", "text")
    assert(img(spark.read.parquet(s"$base/idx")
        .select("id", "band", "bucket")) ===
      img(Dedup.minhashBandIndex(after, "doc_id", "text", sh, nh, bd)))
  }

  test("boilerplateIngest compaction bounds the index partitions, output unchanged") {
    val base = java.nio.file.Files.createTempDirectory("graft_bpc").toString
    val mem = MemoryStream[(Long, String)](spark)
    val compactEvery = 2
    val q = graft.streaming.Pipelines.boilerplateIngest(
      mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$base/clean", s"$base/index", s"$base/ckpt",
      spanTokens = 4, maxDf = 3, compactEvery = compactEvery)
    val footer = (1 to 4).map(i => s"f$i").mkString(" ")
    // 7 batches (> 3×compactEvery), one doc each, every doc carries the
    // footer: doc 4's merged df is 4 > maxDf=3, so docs 4+ get it cut
    val nBatches = 7
    (1 to nBatches).foreach { i =>
      mem.addData((i.toLong, s"one$i two$i $footer"))
      q.processAllAvailable()
    }
    q.stop()
    // partition count stays bounded by the compaction cadence (one base +
    // at most compactEvery-1 deltas), not by batch history
    val parts = new java.io.File(s"$base/index").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(parts.length <= compactEvery,
      s"index partitions grew with history: ${parts.mkString(", ")}")
    assert(parts.exists(_.startsWith("batch=-")), s"no base: ${parts.mkString(", ")}")
    // the resolved index equals the batch operator's full recompute
    val resolved = graft.streaming.Pipelines
      .readSpanDfIndex(spark, s"$base/index")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val full = graft.llm.CorpusStats.spanDfIndex(
      (1 to nBatches).map(i => (i.toLong, s"one$i two$i $footer"))
        .toDF("doc_id", "text"), "doc_id", "text", spanTokens = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(resolved === full)
    // cleaning semantics unchanged: footer kept through doc 3 (merged
    // df ≤ 3 at each one's own batch), cut from doc 4 on
    val out = spark.read.parquet(s"$base/clean")
      .select($"doc_id", $"n_removed").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.length === nBatches)
    out.foreach { case (id, nRem) =>
      if (id <= 3) assert(nRem === 0L, s"doc $id lost its footer early")
      else assert(nRem === 4L, s"doc $id kept a frequent footer")
    }
  }

  test("tfidfIngest: fresh rows equal the batch operator over the union") {
    val base = java.nio.file.Files.createTempDirectory("graft_tfi").toString
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.tfidfIngest(
      mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$base/kw", s"$base/index", s"$base/ckpt", k = 3)
    val b1 = Seq((1L, "alpha beta shared shared"), (2L, "gamma delta shared"),
      (3L, "alpha epsilon zeta"))
    val b2 = Seq((4L, "alpha beta gamma"), (5L, "shared shared theta"))
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable(); q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"term", $"tf", $"df", $"tfidf_key", $"rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val out = spark.read.parquet(s"$base/kw")
    // batch 1 saw only itself: identical to the batch operator over b1
    assert(rows(out.filter($"batch" === 0)) ===
      rows(graft.llm.CorpusStats.tfidfKeywords(
        b1.toDF("doc_id", "text"), "doc_id", "text", 3)))
    // batch 2 ranked against the merged index: byte-identical to the batch
    // operator over b1 ∪ b2 restricted to the fresh ids — the disjoint-id
    // additivity claim, end to end through the persisted index
    assert(rows(out.filter($"batch" === 1)) ===
      rows(graft.llm.CorpusStats.tfidfKeywords(
        (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", 3)
        .filter($"doc_id" >= 4L)))
    // the resolved index equals the batch df over the union
    val resolved = graft.streaming.Pipelines
      .readTermDfIndex(spark, s"$base/index")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val full = graft.llm.CorpusStats.termDfIndex(
      (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(resolved === full)
  }

  test("tfidfIngest compaction bounds the index partitions, index unchanged") {
    val base = java.nio.file.Files.createTempDirectory("graft_tfc").toString
    val mem = MemoryStream[(Long, String)](spark)
    val compactEvery = 2
    val q = graft.streaming.Pipelines.tfidfIngest(
      mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$base/kw", s"$base/index", s"$base/ckpt",
      k = 2, compactEvery = compactEvery)
    val nBatches = 7
    (1 to nBatches).foreach { i =>
      mem.addData((i.toLong, s"alpha uniq$i"))
      q.processAllAvailable()
    }
    q.stop()
    val parts = new java.io.File(s"$base/index").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(parts.length <= compactEvery,
      s"index partitions grew with history: ${parts.mkString(", ")}")
    assert(parts.exists(_.startsWith("batch=-")),
      s"no base: ${parts.mkString(", ")}")
    val resolved = graft.streaming.Pipelines
      .readTermDfIndex(spark, s"$base/index")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val full = graft.llm.CorpusStats.termDfIndex(
      (1 to nBatches).map(i => (i.toLong, s"alpha uniq$i"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(resolved === full)
    assert(resolved("alpha") === nBatches.toLong)
  }

  test("a multi-file compacted base is read identically to a single-file one") {
    // the size-aware compactor may emit >1 file per base partition at
    // scale; the read path must aggregate across base files + deltas
    val base = java.nio.file.Files.createTempDirectory("graft_mfb").toString
    Seq(("alpha", 3L), ("beta", 2L), ("gamma", 1L))
      .toDF("term", "df").repartition(3)
      .write.parquet(s"$base/index/batch=-1")
    Seq(("alpha", 1L), ("delta", 1L))
      .toDF("term", "df")
      .write.parquet(s"$base/index/batch=1")
    val resolved = graft.streaming.Pipelines
      .readTermDfIndex(spark, s"$base/index")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(resolved === Map("alpha" -> 4L, "beta" -> 2L, "gamma" -> 1L,
      "delta" -> 1L))
  }

  test("paraDedupIngest: batch-vs-full equality, compaction-bounded index") {
    val base = java.nio.file.Files.createTempDirectory("graft_pdi").toString
    val mem = MemoryStream[(Long, String)](spark)
    val compactEvery = 2
    val q = graft.streaming.Pipelines.paraDedupIngest(
      mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$base/clean", s"$base/index", s"$base/ckpt",
      maxDf = 3, compactEvery = compactEvery)
    // 7 batches (> 3×compactEvery), one doc each, all carrying the same
    // footer PARAGRAPH: doc 4's merged df is 4 > maxDf=3, so docs 4+ get
    // it cut while docs 1-3 (written when df ≤ 3) stay verbatim
    val all = (1 to 7).map(i => (i.toLong, s"body $i\nshared promo footer"))
    all.foreach { d => mem.addData(d); q.processAllAvailable() }
    q.stop()
    val out = spark.read.parquet(s"$base/clean")
      .select($"doc_id", $"n_paras", $"n_removed", $"clean_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.length === 7)
    out.foreach { case (id, nP, nRem, text) =>
      assert(nP === 2L)
      if (id <= 3) assert(nRem === 0L && text === s"body $id\nshared promo footer",
        s"doc $id cleaned early")
      else assert(nRem === 1L && text === s"body $id", s"doc $id kept the footer")
    }
    // fresh rows are byte-identical to the batch operator over the union
    // restricted to the fresh ids (disjoint-id additivity end to end)
    val full = graft.llm.CorpusStats.dropRepeatedParagraphs(
      all.toDF("doc_id", "text"), "doc_id", "text", maxDf = 3)
      .filter($"doc_id" >= 4L).select($"doc_id", $"n_removed", $"clean_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out.filter(_._1 >= 4).map(t => (t._1, t._3, t._4)).toSet === full)
    // index partitions bounded by the compaction cadence, not history;
    // the resolved index equals the batch recompute over the union
    val parts = new java.io.File(s"$base/index").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(parts.length <= compactEvery,
      s"index partitions grew with history: ${parts.mkString(", ")}")
    assert(parts.exists(_.startsWith("batch=-")), s"no base: ${parts.mkString(", ")}")
    val resolved = graft.streaming.Pipelines
      .readParaDfIndex(spark, s"$base/index")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val fullIdx = graft.llm.CorpusStats.paraDfIndex(
      all.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(resolved === fullIdx)
    assert(resolved.values.max === 7L)
  }

  test("dropIfInReference gates a stream against a static reference (stateless)") {
    // the SAME batch operator runs on a stream unchanged: the bloom builds
    // from the static side at plan time, the pre-filter is map-only, and
    // the confirm is a stateless stream-static anti-join
    val mem = MemoryStream[(Long, String)](spark)
    val ref = Seq("blocked one", "blocked two").toDF("text")
    val gated = graft.llm.Dedup.dropIfInReference(
      mem.toDF().toDF("doc_id", "text"), ref, "doc_id", "text",
      expectedRefDocs = 16, fpp = 0.01)
    val q = gated.writeStream.format("memory").queryName("refgate")
      .outputMode("append").start()
    mem.addData((1L, "clean doc"), (2L, "blocked one"))
    q.processAllAvailable()
    mem.addData((3L, "blocked two"), (4L, "another clean"))
    q.processAllAvailable(); q.stop()
    val kept = spark.table("refgate").select($"doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 4L))
  }

  test("expiring streaming dedup re-admits keys after the event-time TTL") {
    val mem = MemoryStream[(Timestamp, String)](spark)
    val wm = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "0 seconds").as[(Timestamp, String)]
    val dd = Streams.streamingDedupByKeyExpiring[(Timestamp, String)](
      wm, _._2, _._1.getTime, ttlMs = 60 * 1000)
    val q = dd.toDF("ts", "k").writeStream.format("memory").queryName("ttldedup")
      .outputMode("append").start()
    mem.addData((ts("2024-01-01 00:00:00"), "a")); q.processAllAvailable()
    // duplicate within the TTL → dropped (extends retention to 00:01:30)
    mem.addData((ts("2024-01-01 00:00:30"), "a")); q.processAllAvailable()
    // watermark moves to 00:05:00, past a's expiry
    mem.addData((ts("2024-01-01 00:05:00"), "z")); q.processAllAvailable()
    // a has no data this batch → its timed-out state is evicted here
    mem.addData((ts("2024-01-01 00:10:00"), "zz")); q.processAllAvailable()
    // state gone → the key is admitted again (bounded-state trade-off)
    mem.addData((ts("2024-01-01 00:11:00"), "a")); q.processAllAvailable()
    q.stop()
    val ks = spark.table("ttldedup").select($"k").as[String].collect().sorted.toSeq
    assert(ks === Seq("a", "a", "z", "zz"))
  }

  test("corpusIngest composes decode → normalize → dedup → quality gate") {
    val in = java.nio.file.Files.createTempDirectory("graft_ingest_in")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val goodText = ("the quick brown fox and the lazy dog " * 4).trim
    java.nio.file.Files.write(in.resolve("a.ndjson"), Seq(
      s"""{"doc_id":1,"text":"$goodText"}""",
      s"""{"doc_id":2,"text":"  ${goodText.toUpperCase}!!"}""", // case+punct variant
      "not json at all",
      """{"doc_id":3,"text":"x"}""" // too short → quality gate drops it
    ).mkString("\n").getBytes)
    val q = graft.streaming.Pipelines
      .corpusIngest(spark, in.toString + "/*.ndjson", schema, minQuality = 0.3)
      .writeStream.format("memory").queryName("ingest").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("ingest").select($"doc_id").as[Long].collect().sorted
    // doc 2 normalizes to doc 1's text → deduped; corrupt line and doc 3 dropped
    assert(out.toSeq === Seq(1L))
  }

  test("flatMapGroupsWithState running stats accumulate across batches") {
    val mem = MemoryStream[(String, Double)](spark)
    val q = Streams.runningStatsByKey(mem.toDS())
      .toDF("key", "n", "sum")
      .writeStream.format("memory").queryName("runstats")
      .outputMode("append").start()
    mem.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
    q.processAllAvailable()
    mem.addData(("a", 3.0))
    q.processAllAvailable(); q.stop()
    val byBatchEnd = spark.table("runstats")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // batch 1 emits (a,2,3.0) and (b,1,10.0); batch 2 emits updated (a,3,6.0)
    assert(byBatchEnd === Set(("a", 2L, 3.0), ("b", 1L, 10.0), ("a", 3L, 6.0)))
  }

  test("stream-static enrichment join broadcasts the dimension side") {
    val mem = MemoryStream[(Long, Double)](spark)
    val stream = mem.toDF().toDF("user_id", "value")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = Streams.enrich(stream, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    mem.addData((1L, 10.0), (2L, 20.0), (1L, 30.0), (3L, 40.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enriched").select($"user_id", $"tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).sorted
    // unmatched key 3 passes through unenriched (left outer), never dropped
    assert(rows.toSeq === Seq(1L -> Some("gold"), 1L -> Some("gold"),
      2L -> Some("silver"), 3L -> None))
  }

  test("stream-stream interval join matches in-window pairs and drops out-of-window") {
    val clicks = MemoryStream[(Timestamp, Long, String)](spark)
    val buys = MemoryStream[(Timestamp, Long, String)](spark)
    val joined = Streams.intervalJoin(
      clicks.toDF().toDF("click_ts", "user", "click_id"),
      buys.toDF().toDF("buy_ts", "user", "buy_id"),
      Seq("user"), "click_ts", "buy_ts", window = "30 minutes")
    val q = joined.select($"click_id", $"buy_id")
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    clicks.addData((ts("2024-01-01 10:00:00"), 1L, "c1"),
      (ts("2024-01-01 10:00:00"), 2L, "c2"))
    buys.addData(
      (ts("2024-01-01 10:10:00"), 1L, "b1"),  // in window, same user → match
      (ts("2024-01-01 10:50:00"), 1L, "b2"),  // past window → no match
      (ts("2024-01-01 10:10:00"), 3L, "b3"))  // no such click user → no match
    q.processAllAvailable()
    // advance both watermarks so in-window results finalize
    clicks.addData((ts("2024-01-01 12:00:00"), 9L, "c9"))
    buys.addData((ts("2024-01-01 12:00:00"), 9L, "b9"))
    q.processAllAvailable(); q.stop()
    val out = spark.table("ssjoin").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.contains(("c1", "b1")))
    assert(!out.exists(_._2 == "b2"))
    assert(!out.exists(_._2 == "b3"))
  }

  test("attribution pipeline counts in-window conversions per key and window") {
    val clicks = MemoryStream[(Timestamp, Long, String)](spark)
    val buys = MemoryStream[(Timestamp, Long, String)](spark)
    val out = graft.streaming.Pipelines.attribution(
      clicks.toDF().toDF("click_ts", "user", "click_id"),
      buys.toDF().toDF("buy_ts", "user", "buy_id"),
      "user", "click_ts", "buy_ts", "buy_id", window = "30 minutes")
    val q = out.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    // TWO in-window clicks and one purchase: the purchase must be credited
    // once, not once per matching click
    clicks.addData((ts("2024-01-01 10:00:00"), 1L, "c1"),
      (ts("2024-01-01 10:10:00"), 1L, "c1b"))
    buys.addData(
      (ts("2024-01-01 10:05:00"), 1L, "b1"),
      (ts("2024-01-01 10:20:00"), 1L, "b2"),  // both in window → 2 attributed
      (ts("2024-01-01 11:30:00"), 1L, "b3"))  // out of window
    q.processAllAvailable()
    clicks.addData((ts("2024-01-01 14:00:00"), 9L, "c9"))
    buys.addData((ts("2024-01-01 14:00:00"), 9L, "b9"))
    q.processAllAvailable(); q.stop()
    val total = spark.table("attrib").filter($"user" === 1L)
      .agg(sum($"attributed")).head().getLong(0)
    assert(total === 2L, s"each conversion must be credited exactly once (got $total)")
  }

  test("attribution: single credit survives triggers straddling the watermark delay") {
    // The round-2 design keyed the dedup's state lifetime to the TRIGGER
    // time: once the watermark passed trigger1Ts + delay, a later in-window
    // trigger's match found no dedup state and the conversion was credited
    // twice. Choreography: (1) trigger c1@10:00 + conversion b1@10:25 match;
    // (2) filler advances the watermark to ~10:15 — past trigger1+delay but
    // below trigger2's ts; (3) trigger c2@10:20 arrives (not late) and
    // matches the still-buffered conversion. Keying dedup state to the
    // conversion's own event time (constant across matches) keeps it alive
    // until the conversion itself expires → exactly one credit.
    val clicks = MemoryStream[(Timestamp, Long, String)](spark)
    val buys = MemoryStream[(Timestamp, Long, String)](spark)
    val out = graft.streaming.Pipelines.attribution(
      clicks.toDF().toDF("click_ts", "user", "click_id"),
      buys.toDF().toDF("buy_ts", "user", "buy_id"),
      "user", "click_ts", "buy_ts", "buy_id", window = "30 minutes")
    val q = out.writeStream.format("memory").queryName("attrib_straddle")
      .outputMode("append").start()
    clicks.addData((ts("2024-01-01 10:00:00"), 1L, "c1"))
    buys.addData((ts("2024-01-01 10:25:00"), 1L, "b1"))
    q.processAllAvailable()
    // watermark → ~10:15 on both sides (delay 1 min), expiring any state
    // keyed to trigger1's 10:00 event time
    clicks.addData((ts("2024-01-01 10:16:00"), 8L, "cf"))
    buys.addData((ts("2024-01-01 10:16:00"), 8L, "bf"))
    q.processAllAvailable()
    clicks.addData((ts("2024-01-01 10:20:00"), 1L, "c2")) // matches b1 again
    q.processAllAvailable()
    // close all windows
    clicks.addData((ts("2024-01-01 14:00:00"), 9L, "c9"))
    buys.addData((ts("2024-01-01 14:00:00"), 9L, "b9"))
    q.processAllAvailable(); q.stop()
    val total = spark.table("attrib_straddle").filter($"user" === 1L)
      .agg(coalesce(sum($"attributed"), lit(0L))).head().getLong(0)
    assert(total === 1L,
      s"conversion b1 must be credited exactly once across straddling triggers (got $total)")
  }

  test("streaming error budget stops the query once corrupt rows exceed it") {
    val in = java.nio.file.Files.createTempDirectory("graft_budget_in")
    val cp = java.nio.file.Files.createTempDirectory("graft_budget_cp").toString
    val schema = StructType(Seq(StructField("id", StringType)))
    val good = new java.util.concurrent.atomic.AtomicLong()
    java.nio.file.Files.write(in.resolve("a.ndjson"),
      ("{\"id\":\"1\"}\n" + (1 to 5).map(i => s"garbage line $i").mkString("\n")).getBytes)
    val (q, errs) = Streams.decodeWithErrorBudget(
      Streams.decodeJsonStream(spark, in.toString + "/*.ndjson", schema),
      cp, maxErrors = 3, d => good.addAndGet(d.count()))
    q.processAllAvailable()
    // monitor sees 5 > 3 and stops the query
    q.awaitTermination(10000)
    assert(!q.isActive, "query must be stopped by the budget monitor")
    assert(errs.get() === 5 && good.get() === 1)
  }

  test("checkpoint resume: restart processes only new drops (C2 Resume parity)") {
    val in = java.nio.file.Files.createTempDirectory("graft_resume_in")
    val cp = java.nio.file.Files.createTempDirectory("graft_resume_cp").toString
    val schema = StructType(Seq(StructField("id", StringType)))
    val seen = new java.util.concurrent.atomic.AtomicLong()
    def start() = Streams.fanOutForeachBatch(
      spark.readStream.schema(schema).json(in.toString + "/*.ndjson"),
      cp, Seq(d => seen.addAndGet(d.count())))
    java.nio.file.Files.write(in.resolve("a.ndjson"),
      "{\"id\":\"1\"}\n{\"id\":\"2\"}".getBytes)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(seen.get() === 2)
    // restart from the same checkpoint: the old file must NOT be replayed
    java.nio.file.Files.write(in.resolve("b.ndjson"), "{\"id\":\"3\"}".getBytes)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(seen.get() === 3, "checkpoint must fast-forward past processed files")
  }

  test("foreachBatch fan-out: every sink sees every micro-batch row") {
    val mem = MemoryStream[Long](spark)
    val c1 = new java.util.concurrent.atomic.AtomicLong()
    val c2 = new java.util.concurrent.atomic.AtomicLong()
    val cp = java.nio.file.Files.createTempDirectory("graft_cp").toString
    val q = Streams.fanOutForeachBatch(mem.toDF(), cp, Seq(
      d => c1.addAndGet(d.count()),
      d => c2.addAndGet(d.count())))
    mem.addData(1L, 2L, 3L); q.processAllAvailable()
    mem.addData(4L); q.processAllAvailable(); q.stop()
    assert(c1.get() === 4 && c2.get() === 4)
  }

  test("per-batch profiling stamps batch ids and feeds the drift gate") {
    val mem = MemoryStream[Long](spark)
    val cp = java.nio.file.Files.createTempDirectory("graft_cp").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val q = Streams.profilePerBatch(mem.toDF().toDF("v"), cp) { stats =>
      stats.collect().foreach(r => seen.add((r.getAs[Long]("batch_id"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("ndv"))))
    }
    mem.addData(1L, 2L, 2L); q.processAllAvailable()
    mem.addData(5L); q.processAllAvailable(); q.stop()
    val byBatch = seen.toArray(Array.empty[(Long, Long, Long)]).toSeq.sorted
    assert(byBatch === Seq((0L, 3L, 2L), (1L, 1L, 1L)))
  }

  test("dsirIngest: last batch equals the batch operator over the union") {
    import graft.llm.Dsir
    val base = java.nio.file.Files.createTempDirectory("graft_dsi").toString
    // fixed in-domain target: fruit vocabulary
    val target = Seq((901L, "apple banana cherry apple"),
      (902L, "banana cherry apple banana")).toDF("doc_id", "text")
    val targetDist = Dsir.featureDist(
      Dsir.hashedFeatures(target, "doc_id", "text")).localCheckpoint()
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.dsirIngest(
      mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", targetDist,
      s"$base/w", s"$base/index", s"$base/ckpt", compactEvery = 2)
    val b1 = Seq((1L, "apple banana iron"), (2L, "zinc copper iron"))
    val b2 = Seq((3L, "apple cherry banana"), (4L, "iron zinc zinc"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    def wset(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_feats", $"weight_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val out = spark.read.parquet(s"$base/w")
    def featsOf(rows: Seq[(Long, String)]) =
      Dsir.hashedFeatures(rows.toDF("doc_id", "text"), "doc_id", "text")
    // batch 1 scored against its own raw dist only
    assert(wset(out.filter($"batch" === 0)) ===
      wset(Dsir.weightsOfFeatures(featsOf(b1),
        Dsir.featureDist(featsOf(b1)).withColumnRenamed("cnt", "cr"),
        targetDist.withColumnRenamed("cnt", "ct"), "doc_id")))
    // batch 2 scored against the ACCUMULATED raw dist (b1 ∪ b2) via the
    // persisted index — equal to the direct computation over the union
    assert(wset(out.filter($"batch" === 1)) ===
      wset(Dsir.weightsOfFeatures(featsOf(b2),
        Dsir.featureDist(featsOf(b1 ++ b2)).withColumnRenamed("cnt", "cr"),
        targetDist.withColumnRenamed("cnt", "ct"), "doc_id")))
    // the fruit-vocab doc outweighs the metal-vocab doc in its batch
    val w2 = wset(out.filter($"batch" === 1)).map(t => t._1 -> t._3).toMap
    assert(w2(3L) > w2(4L))
    // resolved index = the full-union raw distribution (compaction ran)
    val resolved = graft.streaming.Pipelines
      .readDsirRawDist(spark, s"$base/index")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val full = Dsir.featureDist(featsOf(b1 ++ b2))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(resolved === full)
  }

  test("dsirSelfIngest + dsirRetroScore: retro-score equals the batch operator over the union") {
    import graft.llm.Dsir
    val base = java.nio.file.Files.createTempDirectory("graft_dss").toString
    val mem = MemoryStream[(Long, String, Boolean)](spark)
    val q = graft.streaming.Pipelines.dsirSelfIngest(
      mem.toDF().toDF("doc_id", "text", "is_tgt"),
      "doc_id", "text", "is_tgt",
      s"$base/feats", s"$base/dist", s"$base/ckpt", compactEvery = 2)
    // in-domain exemplars (fruit vocab) arrive INTERLEAVED with raw docs
    val b1 = Seq((1L, "apple banana iron", true),
      (2L, "zinc copper iron", false))
    val b2 = Seq((3L, "apple cherry banana", true),
      (4L, "iron zinc zinc", false))
    val b3 = Seq((5L, "banana banana apple cherry", false))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    mem.addData(b3: _*); q.processAllAvailable(); q.stop()
    def wset(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_feats", $"weight_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the closed caveat: EVERY batch — including batch 0 — retro-scores
    // against the FULL accumulated distributions, bit-identical to the
    // batch operator over the union, with no text re-read
    val union = (b1 ++ b2 ++ b3).toDF("doc_id", "text", "is_tgt")
    val expect = Dsir.importanceWeights(union, "doc_id", "text", $"is_tgt")
    val got = graft.streaming.Pipelines.dsirRetroScore(
      spark, s"$base/feats", s"$base/dist")
    assert(wset(got) === wset(expect))
    // the fruit-vocab raw doc outweighs the metal-vocab raw doc
    val w = wset(got).map(t => t._1 -> t._3).toMap
    assert(w(5L) > w(4L))
    // deletion propagation: forgetting docs 3 (a TARGET exemplar) and 4
    // retro-scores bit-identically to an ingest that never saw them —
    // committed batches untouched, contributions exactly subtracted
    val forgot = graft.streaming.Pipelines.dsirRetroScore(
      spark, s"$base/feats", s"$base/dist",
      forgotten = Some(Seq(3L, 4L).toDF("doc_id")))
    val expectForgot = Dsir.importanceWeights(
      (b1 ++ b3).toDF("doc_id", "text", "is_tgt"),
      "doc_id", "text", $"is_tgt")
    assert(wset(forgot) === wset(expectForgot))
    // empty-target contract: an ingest with NO flagged exemplars fails
    // loudly at scoring time, the batch operator's raise_error stance
    val base2 = java.nio.file.Files.createTempDirectory("graft_dss2").toString
    val mem2 = MemoryStream[(Long, String, Boolean)](spark)
    val q2 = graft.streaming.Pipelines.dsirSelfIngest(
      mem2.toDF().toDF("doc_id", "text", "is_tgt"),
      "doc_id", "text", "is_tgt",
      s"$base2/feats", s"$base2/dist", s"$base2/ckpt")
    mem2.addData((9L, "no exemplars here", false))
    q2.processAllAvailable(); q2.stop()
    intercept[Exception] {
      graft.streaming.Pipelines.dsirRetroScore(
        spark, s"$base2/feats", s"$base2/dist").collect()
    }
  }

  test("dsirRetroScore races a concurrent ingest: consistent prefix, never silent drops") {
    import graft.llm.Dsir
    val base = java.nio.file.Files.createTempDirectory("graft_dsc").toString
    val mem = MemoryStream[(Long, String, Boolean)](spark)
    val q = graft.streaming.Pipelines.dsirSelfIngest(
      mem.toDF().toDF("doc_id", "text", "is_tgt"),
      "doc_id", "text", "is_tgt",
      s"$base/feats", s"$base/dist", s"$base/ckpt", compactEvery = 2)
    val b1 = Seq((1L, "apple banana iron", true),
      (2L, "zinc copper iron", false))
    val b2 = Seq((3L, "apple cherry banana", true),
      (4L, "iron zinc zinc", false))
    val b3 = Seq((5L, "banana tungsten apple cherry", false))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable() // compaction → base batch=-2
    mem.addData(b3: _*); q.processAllAvailable(); q.stop()
    def wset(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_feats", $"weight_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // simulate the r13-ADVICE window: the writer commits feats batch=2
    // strictly before the dist delta batch=2 — drop the delta's _SUCCESS
    // as a reader concurrent with that gap would find it. Doc 5 carries a
    // bucket ('tungsten') absent from the resolved dist; the old inner
    // join silently dropped those rows and mis-scored doc 5.
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$base/dist/batch=2/_SUCCESS"), false))
    val got = graft.streaming.Pipelines.dsirRetroScore(
      spark, s"$base/feats", s"$base/dist")
    // the scored set is EXACTLY the prefix whose dist contribution is
    // resolvable (b1 ∪ b2 via the base), bit-identical to the batch
    // operator over that prefix — doc 5 is deferred, not corrupted
    val expectPrefix = Dsir.importanceWeights(
      (b1 ++ b2).toDF("doc_id", "text", "is_tgt"),
      "doc_id", "text", $"is_tgt")
    assert(wset(got) === wset(expectPrefix))
    // once the delta commits, the full union scores again
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$base/dist/batch=2/_SUCCESS"), true)
    out.close()
    val full = graft.streaming.Pipelines.dsirRetroScore(
      spark, s"$base/feats", s"$base/dist")
    val expectFull = Dsir.importanceWeights(
      (b1 ++ b2 ++ b3).toDF("doc_id", "text", "is_tgt"),
      "doc_id", "text", $"is_tgt")
    assert(wset(full) === wset(expectFull))
  }

  test("weightsOfFeatures raise_errors on a feats bucket absent from rawDist") {
    import graft.llm.Dsir
    // the precondition is enforced, not assumed: an uncovered bucket must
    // fail loudly instead of being dropped by a silent inner join
    val feats = Seq((1L, "abc", 2L), (1L, "fff", 1L)).toDF("doc_id", "bkt", "m")
    val raw = Seq(("abc", 5L)).toDF("bkt", "cr")
    val tgt = Seq(("abc", 2L)).toDF("bkt", "ct")
    val e = intercept[Exception] {
      Dsir.weightsOfFeatures(feats, raw, tgt, "doc_id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("absent from rawDist")))
    // covered feats still score exactly as before the guard
    val ok = Dsir.weightsOfFeatures(
        feats.filter($"bkt" === "abc"), raw, tgt, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ok.length === 1 && ok.head._1 === 1L && ok.head._2 === 2L)
  }

  test("blocklistIngest/entropyIngest: streamed signals equal the batch operator over the union") {
    import graft.llm.TextOps
    val b1 = Seq((1L, "clean words here"), (2L, "a bad phrase and a dup here"))
    val b2 = Seq((3L, "dup dup bad phrase"), (4L, "x x x x y"))
    val phrases = Seq("bad phrase", "dup")

    def runLoop(tag: String,
        start: (org.apache.spark.sql.DataFrame, String, String) =>
          org.apache.spark.sql.streaming.StreamingQuery): org.apache.spark.sql.DataFrame = {
      val base = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
      val mem = MemoryStream[(Long, String)](spark)
      val q = start(mem.toDF().toDF("doc_id", "text"),
        s"$base/out", s"$base/ckpt")
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable(); q.stop()
      spark.read.parquet(s"$base/out").drop("batch")
    }
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet

    // blocklist: per-document, so streamed ≡ batch over the union, exactly
    val gotB = runLoop("bl", (s, out, ck) =>
      graft.streaming.Pipelines.blocklistIngest(s, "doc_id", "text",
        phrases, out, ck))
    val expB = TextOps.blocklistCounts((b1 ++ b2).toDF("doc_id", "text"),
      "doc_id", "text", phrases)
    assert(rows(gotB.select($"doc_id", $"n_blocked", $"n_phrases", $"blocked"))
      === rows(expB.select($"doc_id", $"n_blocked", $"n_phrases", $"blocked")))
    assert(gotB.filter($"blocked").count() === 2)

    // entropy: same stateless equality
    val gotE = runLoop("ent", (s, out, ck) =>
      graft.streaming.Pipelines.entropyIngest(s, "doc_id", "text", out, ck))
    val expE = TextOps.tokenEntropy((b1 ++ b2).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(rows(gotE.select($"doc_id", $"n_tokens", $"n_types", $"entropy_micro"))
      === rows(expE.select($"doc_id", $"n_tokens", $"n_types", $"entropy_micro")))

    // span corruption: mask is a pure (doc, pos) function → streamed pairs
    // bit-equal the batch pairs over the union
    val gotS = runLoop("sk", (s, out, ck) =>
      graft.streaming.Pipelines.spanCorruptIngest(s, "doc_id", "text",
        out, ck))
    val expS = TextOps.spanCorrupt((b1 ++ b2).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(rows(gotS.select($"doc_id", $"input_text", $"target_text"))
      === rows(expS.select($"doc_id", $"input_text", $"target_text")))
  }

  test("lmScoreIngest: batch scores equal the batch operator with the union as reference") {
    import graft.llm.CorpusStats
    val base = java.nio.file.Files.createTempDirectory("graft_lmsb").toString
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.lmScoreIngest(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$base/scores", s"$base/index", s"$base/ckpt", compactEvery = 2)
    val b1 = Seq((1L, "a b c d"), (2L, "a b c"))
    val b2 = Seq((3L, "x b c d"), (4L, "x y z a b c"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    def sset(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_trigrams", $"sb_nll_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val out = spark.read.parquet(s"$base/scores")
    def score(docs: Seq[(Long, String)], ref: Seq[(Long, String)]) =
      CorpusStats.stupidBackoffScore(ref.toDF("doc_id", "text"),
        docs.toDF("doc_id", "text"), "doc_id", "text")
    // batch 1: scored against its own counts only
    assert(sset(out.filter($"batch" === 0)) === sset(score(b1, b1)))
    // batch 2: scored against the ACCUMULATED index (b1 ∪ b2)
    assert(sset(out.filter($"batch" === 1)) === sset(score(b2, b1 ++ b2)))
    // resolved index equals the batch index over the union
    val resolved = graft.streaming.Pipelines
      .readNgramIndex(spark, s"$base/index")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val full = CorpusStats.ngramIndex((b1 ++ b2).toDF("doc_id", "text"), "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(resolved === full)
    assert(full("1:b") === 4L && full("2:b c") === 4L && full("3:a b c") === 3L)
  }

  test("bm25Ingest: batch scores equal the batch operator over the union corpus") {
    import graft.llm.Retrieval
    val base = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    val queries = Seq("qf" -> "apple banana", "qm" -> "iron zinc")
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.bm25Ingest(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", queries,
      s"$base/scores", s"$base/index", s"$base/ckpt", compactEvery = 2)
    val b1 = Seq((1L, "apple banana iron apple"), (2L, "zinc copper iron"))
    val b2 = Seq((3L, "apple cherry banana"), (4L, "iron zinc zinc iron"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    def sset(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"doc_id", $"n_terms", $"score_micro").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val out = spark.read.parquet(s"$base/scores")
    def score(docs: Seq[(Long, String)], statsOver: Seq[(Long, String)]) =
      Retrieval.bm25ScoreAgainstIndex(docs.toDF("doc_id", "text"),
        "doc_id", "text", queries,
        Retrieval.bm25Index(statsOver.toDF("doc_id", "text"), "doc_id", "text"))
    // batch 1: scored against its own statistics only
    assert(sset(out.filter($"batch" === 0)) === sset(score(b1, b1)))
    // batch 2: scored against the ACCUMULATED index (b1 ∪ b2) via the
    // persisted state — equal to the direct computation over the union
    assert(sset(out.filter($"batch" === 1)) === sset(score(b2, b1 ++ b2)))
    // the resolved index equals the batch index over the full union
    val resolved = graft.streaming.Pipelines
      .readBm25Index(spark, s"$base/index")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val full = Retrieval.bm25Index((b1 ++ b2).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(resolved === full)
    assert(full(Retrieval.DocCountKey) === 4L)
    assert(full(Retrieval.TokenCountKey) === 14L)
  }

  test("videoDedupIngest drops shared-frame renditions across and within batches") {
    import graft.llm.VideoHash
    val base = java.nio.file.Files.createTempDirectory("graft_vdi").toString
    val mem = MemoryStream[(Long, Array[Byte])](spark)
    val q = graft.streaming.Pipelines.videoDedupIngest(
      mem.toDF().toDF("media_id", "media"), "media_id", "media",
      s"$base/corpus", s"$base/index", s"$base/ckpt")
    // batch 0: clip A + a WITHIN-batch rendition of it + undecodable junk
    mem.addData((1L, VideoHash.synthGif(5L, 64, 48, 4)),
      (2L, VideoHash.synthGifSlice(5L, 96, 72, 1, 4)),
      (9L, "junk".getBytes))
    q.processAllAvailable()
    // batch 1: a CROSS-batch rendition of A + a genuinely new clip B
    mem.addData((3L, VideoHash.synthGifSlice(5L, 96, 72, 0, 3)),
      (4L, VideoHash.synthGif(6L, 64, 48, 4)))
    q.processAllAvailable(); q.stop()
    val kept = spark.read.parquet(s"$base/corpus")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 9L)) // renditions 2 and 3 dropped; junk survives
    // the index carries only survivors' frames, never the junk row
    val idxIds = spark.read.parquet(s"$base/index")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxIds === Set(1L, 4L))
  }

  test("scriptAuditIngest: streamed panel equals the batch expressions") {
    val base = java.nio.file.Files.createTempDirectory("graft_sa").toString
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.scriptAuditIngest(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$base/out", s"$base/ckpt")
    mem.addData((1L, "hello world"), (2L, "Привет мир"))
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(s"$base/out")
      .select($"doc_id", $"latin", $"cyrillic", $"dominant").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(got === Map(1L -> ((10L, 0L, "latin")),
      2L -> ((0L, 9L, "cyrillic"))))
  }

  test("rougeFlagIngest: streamed flags equal the batch operator (stateless)") {
    val base = java.nio.file.Files.createTempDirectory("graft_rg").toString
    Seq((900L, "the dog sat on the mat")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$base/ref")
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.rougeFlagIngest(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", s"$base/ref",
      s"$base/out", s"$base/ckpt")
    val b0 = Seq((1L, "the cat sat on mat"), (2L, "unrelated words here"))
    val b1 = Seq((3L, "the dog sat on the mat"))
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable(); q.stop()
    def fm(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"best_ref_id", $"rouge_l_micro", $"flagged")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val streamed = fm(spark.read.parquet(s"$base/out"))
    def tok(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", graft.llm.TextOps.tokens($"text").as("t"))
    val batch = fm(graft.llm.Dedup.rougeLVsReference(
      tok((b0 ++ b1).toDF("doc_id", "text")),
      tok(spark.read.parquet(s"$base/ref")),
      "doc_id", "t", "doc_id", "t"))
    assert(streamed === batch)
    assert(streamed(3L)._3 && !streamed(2L)._3)
  }

  test("perceptronScoreIngest: batch margins equal a refit on the union corpus") {
    import graft.llm.Classifier
    val base = java.nio.file.Files.createTempDirectory("graft_pc").toString
    val label = "text LIKE '%good%'"
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.perceptronScoreIngest(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", label,
      s"$base/scores", s"$base/index", s"$base/ckpt", dim = 32,
      iterations = 3, compactEvery = 2)
    val b0 = Seq((1L, "good clean prose"), (2L, "buy spam now"))
    val b1 = Seq((3L, "spam spam buy"), (4L, "buy now good"))
    val b2 = Seq((5L, "fresh good words"), (6L, "buy spam"))
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    def sset(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"margin", $"pred").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val out = spark.read.parquet(s"$base/scores")
    def score(docs: Seq[(Long, String)], trainOver: Seq[(Long, String)]) = {
      val tr = trainOver.toDF("doc_id", "text")
        .withColumn("y", org.apache.spark.sql.functions.expr(label))
      Classifier.perceptronScore(docs.toDF("doc_id", "text"),
        Classifier.perceptronTrain(tr, "doc_id", "text", "y", dim = 32,
          iterations = 3),
        "doc_id", "text", dim = 32)
    }
    // every batch scores exactly as a fresh fit on the union-so-far
    assert(sset(out.filter($"batch" === 0)) === sset(score(b0, b0)))
    assert(sset(out.filter($"batch" === 1)) === sset(score(b1, b0 ++ b1)))
    assert(sset(out.filter($"batch" === 2)) ===
      sset(score(b2, b0 ++ b1 ++ b2)))
  }

  test("nbScoreIngest: batch margins equal the batch operator over the union corpus") {
    import graft.llm.Classifier
    val base = java.nio.file.Files.createTempDirectory("graft_nb").toString
    val label = "text LIKE '%good%'"
    val mem = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Pipelines.nbScoreIngest(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", label,
      s"$base/scores", s"$base/index", s"$base/ckpt", compactEvery = 2)
    // batch 0 is ONE-CLASS (all positive): no prior yet — must emit an
    // empty scores partition and keep the evidence
    val b0 = Seq((1L, "good clean prose"), (2L, "good text"))
    val b1 = Seq((3L, "spam spam buy"), (4L, "buy now good"))
    val b2 = Seq((5L, "fresh good words"), (6L, "buy spam"))
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    def sset(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_tokens", $"nb_margin_micro", $"nb_pos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val out = spark.read.parquet(s"$base/scores")
    assert(out.filter($"batch" === 0).count() === 0)
    def score(docs: Seq[(Long, String)], trainOver: Seq[(Long, String)]) =
      Classifier.naiveBayesScore(docs.toDF("doc_id", "text"),
        "doc_id", "text",
        Classifier.naiveBayesTrain(trainOver.toDF("doc_id", "text"),
          "text", org.apache.spark.sql.functions.expr(label)))
    // batch 1: scored against accumulated evidence (b0 ∪ b1)
    assert(sset(out.filter($"batch" === 1)) === sset(score(b1, b0 ++ b1)))
    // batch 2: accumulated (b0 ∪ b1 ∪ b2)
    assert(sset(out.filter($"batch" === 2)) ===
      sset(score(b2, b0 ++ b1 ++ b2)))
    // the resolved keyed model decodes to the batch model over the union
    val resolved = Classifier.fromKeyedModel(graft.streaming.Pipelines
        .readNbModel(spark, s"$base/index"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = Classifier.naiveBayesTrain(
        (b0 ++ b1 ++ b2).toDF("doc_id", "text"), "text",
        org.apache.spark.sql.functions.expr(label))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(resolved === full)
  }

  test("bitextIngest + bitextRetroMine: read-time mining over streamed " +
      "per-side state equals batch candidate-fed mining over the unions " +
      "(exactly — mining is a pure function of the sides)") {
    import graft.llm.{Retrieval, Similarity}
    import graft.streaming.Pipelines
    val base = java.nio.file.Files.createTempDirectory("graft_bti").toString
    def v(x: Double*): Seq[Double] = x ++ Seq.fill(8 - x.size)(0.0)
    // planted near-identical cross-side pairs + distractors; id spaces
    // COLLIDE across sides on purpose (src 0 ↔ tgt 0 is a true pair —
    // the excludeSelf=false contract must survive the state round trip)
    val srcB1 = Seq((0L, v(1.0, 0.1)), (1L, v(0.0, 1.0)),
      (2L, v(0.5, 0.5)))
    val srcB2 = Seq((3L, v(0.9, -0.1)), (4L, v(0.1, 0.9, 0.2)))
    val tgtB1 = Seq((0L, v(1.0, 0.12)), (5L, v(0.0, 0.95)))
    val tgtB2 = Seq((6L, v(0.52, 0.48)), (7L, v(-1.0, 0.0)))
    def ingest(name: String, batches: Seq[Seq[(Long, Seq[Double])]]): Unit = {
      val mem = MemoryStream[(Long, Seq[Double])](spark)
      val q = Pipelines.bitextIngest(
        mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        s"$base/$name/vecs", s"$base/$name/idx", s"$base/$name/ckpt",
        tables = 4, bits = 4)
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
    }
    ingest("src", Seq(srcB1, srcB2))
    ingest("tgt", Seq(tgtB1, tgtB2))
    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    def retro(fSrc: Option[org.apache.spark.sql.DataFrame] = None) =
      Pipelines.bitextRetroMine(spark,
        s"$base/src/vecs", s"$base/src/idx",
        s"$base/tgt/vecs", s"$base/tgt/idx",
        k = 2, bits = 4, marginThresholdMicro = 1000000L,
        forgottenSrc = fSrc)
    def batchMine(src: org.apache.spark.sql.DataFrame,
        tgt: org.apache.spark.sql.DataFrame) = {
      val (sl, tl) = Similarity.annTopKBitext(src, tgt, k = 2,
        tables = 4, bits = 4, idCol = "vec_id", vecCol = "embedding")
      Retrieval.bitextMineFromCandidates(src, tgt, "vec_id", "embedding",
        sl, tl, k = 2, marginThresholdMicro = 1000000L)
    }
    val srcU = (srcB1 ++ srcB2).toDF("vec_id", "embedding")
    val tgtU = (tgtB1 ++ tgtB2).toDF("vec_id", "embedding")
    val mined = img(retro())
    assert(mined === img(batchMine(srcU, tgtU)))
    assert(mined.nonEmpty, "fixture inert — no pair cleared the margin")
    // the colliding-id candidate (src 0, tgt 0) must SURVIVE the state
    // round trip into the candidate lists (no self-exclusion — r15
    // advice); whether it wins mutual-best is the margin tail's business
    // (here src 0's dense neighborhood deflates its margin and (3, 0)
    // wins tgt 0 instead — both checked against batch above)
    val (svS, shS) = Pipelines.readBitextSide(spark,
      s"$base/src/vecs", s"$base/src/idx")
    val (tvS, thS) = Pipelines.readBitextSide(spark,
      s"$base/tgt/vecs", s"$base/tgt/idx")
    val (slS, _) = Similarity.bitextListsFromState(svS, shS, tvS, thS,
      k = 2, bitsN = 4, maxBucketSize = 10000, multiProbe = true)
    assert(slS.where($"query_id" === 0L && $"neighbor_id" === 0L)
      .count() === 1L,
      "colliding-id candidate (0, 0) lost by the state-fed feed")
    // a reader racing the writer BETWEEN a batch's two commits (vecs
    // landed, index not yet) must exclude that batch from BOTH frames —
    // plant an orphan vecs partition and assert the read is unchanged
    Seq((999L, Seq.fill(8)(127))).toDF("id", "q")
      .write.parquet(s"$base/src/vecs/batch=99")
    assert(img(retro()) === mined,
      "an orphan vecs batch (no index rows yet) leaked into the read")
    // forget = exact tombstone anti-join: mined state equals batch
    // mining over sides that never saw the forgotten doc, margins
    // reflowed (k-NN sums recompute at read time)
    val gone = Seq(0L).toDF("id")
    val minedF = img(retro(fSrc = Some(gone)))
    assert(minedF === img(batchMine(
      srcU.filter($"vec_id" =!= 0L), tgtU)))
    assert(!minedF.exists(_.head == 0L),
      "forgotten src doc still mined")
    assert(minedF !== mined, "forget case inert — tombstone changed nothing")
  }
}
