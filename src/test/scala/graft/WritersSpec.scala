package graft

import graft.etl._
import org.apache.spark.sql.functions._

class WritersSpec extends SparkSpec {
  import spark.implicits._

  test("O1/E1: CSV write with options round-trips (quoted delimiters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_out").toString + "/out"
    val df = Seq((1L, "plain"), (2L, "with, comma"), (3L, "with|pipe"))
      .toDF("id", "note")
    Writers.csv(df, dir, CsvWriteOptions(delimiter = '|', writeHeaders = true))
    val back = spark.read.option("header", "true").option("sep", "|")
      .csv(dir).orderBy("id").collect()
    assert(back.length === 3)
    assert(back(1).getString(1) === "with, comma")
    assert(back(2).getString(1) === "with|pipe") // quoted on write
  }

  test("partitioned parquet write prunes partitions on filtered re-read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_out").toString + "/out"
    Writers.parquet(Tables(spark, sf0001).orders
      .withColumn("year", year($"o_orderdate")), dir, partitionBy = Seq("year"))
    val plan = spark.read.parquet(dir).filter($"year" === 1997)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(year"))
  }

  test("partitionedParquet: one file per partition value, re-split by maxRecordsPerFile") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString + "/out"
    val docs = Tables(spark, sf0001).documents.select($"doc_id", $"lang", $"text")
    Writers.partitionedParquet(docs, dir, Seq("lang"))
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
    }.toMap
    assert(files.keySet.forall(_.startsWith("lang=")))
    // routed by partition column: exactly one file per lang directory
    assert(files.values.forall(_ === 1), s"expected 1 file per lang, got $files")

    // tiny maxRecordsPerFile re-splits within a partition value
    val dir2 = java.nio.file.Files.createTempDirectory("graft_layout2").toString + "/out"
    Writers.partitionedParquet(docs, dir2, Seq("lang"), maxRecordsPerFile = 10L)
    val enFiles = new java.io.File(dir2).listFiles().filter(_.isDirectory)
      .find(_.getName.startsWith("lang=")).get
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(enFiles > 1)

    // round trip is lossless
    val back = spark.read.parquet(dir).count()
    assert(back === docs.count())
  }

  test("upsertPartitionedParquet rewrites only touched partitions, merges by key") {
    val root = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/ds"
    val initial = Seq(
      (1L, "en", "one"), (2L, "en", "two"), (3L, "de", "drei"), (4L, "fr", "quatre")
    ).toDF("id", "lang", "payload")
    Writers.upsertPartitionedParquet(initial, root, Seq("id"), Seq("lang"))

    val deDir = new java.io.File(s"$root/lang=de")
    val deBefore = deDir.listFiles().map(f => f.getName -> f.lastModified()).toMap

    // update id=2, insert id=9 — only lang=en is touched
    val updates = Seq((2L, "en", "TWO"), (9L, "en", "nine"))
      .toDF("id", "lang", "payload")
    Writers.upsertPartitionedParquet(updates, root, Seq("id"), Seq("lang"))

    val back = spark.read.parquet(root)
    assert(back.count() === 5)
    assert(back.filter($"id" === 2L).select("payload").head().getString(0) === "TWO")
    assert(back.filter($"id" === 9L).count() === 1)
    assert(back.filter($"lang" === "de").count() === 1)
    // untouched partition directory: identical files, untouched mtimes
    val deAfter = deDir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(deAfter === deBefore, "lang=de partition must not be rewritten")
  }

  test("upsertPartitionedParquet: null partition values and empty batches are safe") {
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_null").toString + "/ds"
    val initial = Seq(
      (2L, Option("en"), "two"), (5L, None: Option[String], "five"),
      (6L, None: Option[String], "six")
    ).toDF("id", "lang", "payload")
    Writers.upsertPartitionedParquet(initial, root, Seq("id"), Seq("lang"))

    // empty update batch: must be a no-op, not a crash
    Writers.upsertPartitionedParquet(initial.filter($"id" === -1L), root,
      Seq("id"), Seq("lang"))
    assert(spark.read.parquet(root).count() === 3)

    // update a key inside the null partition: the sibling null-partition
    // row must survive (needs null-safe partition pruning)
    val up = Seq((5L, None: Option[String], "FIVE")).toDF("id", "lang", "payload")
    Writers.upsertPartitionedParquet(up, root, Seq("id"), Seq("lang"))
    val back = spark.read.parquet(root)
    assert(back.count() === 3)
    assert(back.filter($"id" === 5L).select("payload").head().getString(0) === "FIVE")
    assert(back.filter($"id" === 6L).count() === 1, "sibling null-partition row lost")
  }

  test("clusteredParquet: per-file value ranges are disjoint (data skipping layout)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cluster").toString + "/out"
    Writers.clusteredParquet(
      Tables(spark, sf0001).orders.select($"o_orderkey", $"o_totalprice"),
      dir, "o_orderkey", targetFiles = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 2)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min($"o_orderkey"), max($"o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi < lo, s"file ranges overlap: $ranges")
      case _ =>
    }
    // a point predicate must prune to a single file's row-group stats:
    // all files minus the one whose range covers the key can be skipped
    val key = ranges.head._2 // max of first file → only file 1 can match
    assert(ranges.count { case (lo, hi) => lo <= key && key <= hi } === 1)
  }

  test("zorderParquet: files skip on BOTH cluster columns; 1-col clustering cannot") {
    val src = Tables(spark, sf0001).orders
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val zdir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/out"
    Writers.zorderParquet(src, zdir, Seq("o_custkey", "o_totalprice"),
      targetFiles = 16)

    def ranges(dir: String, c: String): Array[(Double, Double)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
          (r.getDouble(0), r.getDouble(1))
        }
    // a bottom-decile range predicate on EITHER column must skip files
    // via footer stats alone. 16 files = 4 block-prefix bits (cb3, pb3,
    // cb2, pb2), so the cut constrains two of them per dimension -> only
    // the 4 blocks with that quarter-prefix can overlap; block alignment
    // guarantees every other file's min sits above the cut.
    def overlapping(dir: String, c: String): Int = {
      val rs = ranges(dir, c)
      assert(rs.length >= 8, s"expected >=8 files, got ${rs.length}")
      val lo = rs.map(_._1).min
      val hi = rs.map(_._2).max
      val cut = lo + (hi - lo) * 0.1
      rs.count { case (mn, _) => mn <= cut } // files a scan <= cut must read
    }
    val nz = ranges(zdir, "o_custkey").length
    assert(overlapping(zdir, "o_custkey") <= nz / 2)
    assert(overlapping(zdir, "o_totalprice") <= nz / 2)

    // baseline: single-column clustering leaves the OTHER column
    // unclustered — every file overlaps the same predicate
    val cdir = java.nio.file.Files.createTempDirectory("graft_zbase").toString + "/out"
    Writers.clusteredParquet(src, cdir, "o_custkey", targetFiles = 8)
    val nc = ranges(cdir, "o_totalprice").length
    assert(overlapping(cdir, "o_totalprice") === nc)

    // layout must not lose or duplicate rows
    assert(spark.read.parquet(zdir).count() === src.count())
  }

  test("ORC sink round-trips with filter pushdown on re-read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/out"
    val src = Tables(spark, sf0001).orders.select($"o_orderkey", $"o_totalprice")
    Writers.orc(src, dir)
    val back = spark.read.orc(dir)
    assert(back.count() === src.count())
    val plan = back.filter($"o_orderkey" === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey)"), plan.take(400))
  }

  test("session parquet writes use zstd compression") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zstd").toString + "/out"
    Writers.parquet(Tables(spark, sf0001).region, dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".zstd.parquet")), files.mkString(","))
  }

  test("O7: file queue push/pop with content-hash keys and atomic drops") {
    val q = new FileQueue(
      java.nio.file.Files.createTempDirectory("graft_queue").toString)
    val k1 = q.push("""{"job":"a"}""")
    q.push("""{"job":"b"}""")
    q.push("""{"job":"a"}""") // same content → same key → idempotent
    assert(q.size === 2)
    assert(k1.length === 32)
    val popped = Seq(q.pop(), q.pop(), q.pop())
    assert(popped.count(_.isDefined) === 2)
    assert(q.size === 0)
  }

  test("C8: glob listing with regex filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_glob")
    java.nio.file.Files.write(dir.resolve("a_1.ndjson"), "x".getBytes)
    java.nio.file.Files.write(dir.resolve("a_2.ndjson"), "x".getBytes)
    java.nio.file.Files.write(dir.resolve("b_1.csv"), "x".getBytes)
    val all = FileListing.list(spark, dir.toString + "/*")
    assert(all.size === 3)
    val onlyNdjson = FileListing.list(spark, dir.toString + "/*",
      regex = Some(".*a_\\d+\\.ndjson"))
    assert(onlyNdjson.size === 2)
  }

  test("QueueClient seam: FileQueue and InMemoryQueue dedup by content md5") {
    val fq: QueueClient = new FileQueue(
      java.nio.file.Files.createTempDirectory("graft_qc").toString)
    val mq: QueueClient = new InMemoryQueue
    Seq(fq, mq).foreach { q =>
      val id1 = q.push("""{"msg":1}""")
      val id2 = q.push("""{"msg":1}""") // same body → same dedup id, 1 entry
      val id3 = q.push("""{"msg":2}""")
      assert(id1 === id2)
      assert(id1 !== id3)
      assert(id1 === QueueClient.dedupId("""{"msg":1}"""))
      assert(q.size === 2)
      assert(q.pop().isDefined && q.pop().isDefined && q.pop().isEmpty)
    }
  }

  test("Staging.fetch pulls remote files into a staging dir, then decodes (C9)") {
    val remote = java.nio.file.Files.createTempDirectory("graft_remote")
    java.nio.file.Files.write(remote.resolve("a.txt"), "l1\nl2".getBytes)
    java.nio.file.Files.write(remote.resolve("b.txt"), "l3".getBytes)
    java.nio.file.Files.write(remote.resolve("skip.csv"), "x".getBytes)
    val staging = java.nio.file.Files.createTempDirectory("graft_staging").toString
    val staged = Staging.fetch(spark, Seq(remote.toString + "/*"),
      staging, regex = Some(".*\\.txt"))
    assert(staged.size === 2 && staged.forall(_.contains(staging)))
    val lines = Staging.fetchLines(spark, Seq(remote.toString + "/*.txt"),
      staging + "2")
    assert(lines.count() === 3)
    // lineage points at the STAGED copy, not the remote origin
    assert(lines.select("source").distinct().count() === 2)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // a crashed previous run can leave the managed location behind without
    // a catalog entry — clear it or saveAsTable refuses
    Seq("b_orders", "b_customer").foreach { t =>
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Writers.bucketed(Tables(spark, sf0001).orders
      .select($"o_orderkey", $"o_custkey", $"o_totalprice"),
      "b_orders", Seq("o_custkey"), 8)
    Writers.bucketed(Tables(spark, sf0001).customer
      .select($"c_custkey", $"c_mktsegment"),
      "b_customer", Seq("c_custkey"), 8)
    // tiny test tables would broadcast (which also ignores bucketing) —
    // force the shuffle-join path to observe the bucket co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(
        spark.table("b_customer").withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"), s"expected exchange-free bucketed join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
  }

  test("compactParquet merges small files shuffle-free, content preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val out2 = s"$dir/out2"
    val df = spark.range(0, 10000).selectExpr("id", "id % 7 AS grp")
    df.repartition(40).write.parquet(in) // 40 tiny files
    def nParquet(p: String) =
      new java.io.File(p).listFiles.count(_.getName.endsWith(".parquet"))
    assert(nParquet(in) === 40)

    // generous target → single file; content identical
    val n1 = Writers.compactParquet(spark, in, out, targetFileBytes = 1L << 30)
    assert(n1 === 1 && nParquet(out) === 1)
    assert(spark.read.parquet(out).exceptAll(df).count() === 0)
    assert(df.exceptAll(spark.read.parquet(out)).count() === 0)

    // tiny target → several files, never more than the input count
    val n2 = Writers.compactParquet(spark, in, out2, targetFileBytes = 20000L)
    assert(n2 > 1 && nParquet(out2) <= 40)
    assert(spark.read.parquet(out2).count() === 10000)

    // the rewrite is a narrow plan: no Exchange anywhere
    val plan = spark.read.parquet(in).coalesce(n1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
