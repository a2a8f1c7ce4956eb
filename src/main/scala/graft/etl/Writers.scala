package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File/object sinks (reference O1/O2/E1) and queue parity (O7/S10).
  *
  * The reference writes one file per sink task with hand-rolled buffers and
  * multipart uploads (`etl-core/src/datastore/fs.rs:184-242`,
  * `etl-aws-utils/src/s3_datastore.rs:88-129`); Spark writes one file per
  * partition through the committer protocol (atomic, retry-safe, S3A
  * multipart under the hood) — `coalesce(1)` only when a single file is
  * genuinely required.
  */
object Writers {

  /** O1/E1: CSV out with the reference's CsvWriteOptions mapping. */
  def csv(df: DataFrame, path: String, opts: CsvWriteOptions = CsvWriteOptions(),
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).options(opts.toSpark).csv(path)

  /** O1: NDJSON out. */
  def json(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Columnar out — the scale default (pruning + pushdown on re-read). */
  def parquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC out — the other native columnar format (same pruning/pushdown
    * story as parquet; pick by ecosystem, not capability).
    */
  def orc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Hive-partitioned parquet layout with small-file control — the 100 TB
    * output op. A plain `partitionBy` write emits one file per (task ×
    * partition value): 1000 tasks × 100 partition values = 100k tiny files.
    * Repartitioning by the partition columns first routes each value to one
    * task, and `maxRecordsPerFile` re-splits genuinely large partitions, so
    * file count ≈ max(#values, rows / maxRecordsPerFile). Skewed values are
    * salted across `ceil(tasksPerPartition)` tasks when > 1 to keep a hot
    * partition value from serializing on a single writer.
    */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L, tasksPerPartition: Int = 1,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(tasksPerPartition >= 1, "tasksPerPartition must be >= 1")
    // salt must be DETERMINISTIC per row: monotonically_increasing_id()
    // changes on task re-execution, and a nondeterministic repartition key
    // loses/duplicates rows under fetch-failure retries (SPARK-23207 class).
    // Hashing the row's own columns re-routes identically on recompute.
    // Tradeoff: identical rows share a salt, so a hot partition value made
    // of duplicate rows still serializes — dedup first, or add a distinct
    // discriminator column, if that is your shape. MapType columns are not
    // hashable and are excluded; names are backtick-quoted (dots).
    val routed =
      if (tasksPerPartition == 1) df.repartition(partitionCols.map(col): _*)
      else {
        val hashable = df.schema.fields
          .filter(!_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
          .map(f => col(s"`${f.name}`"))
        require(hashable.nonEmpty,
          "tasksPerPartition > 1 needs at least one non-map column to salt on")
        df.repartition(partitionCols.map(col) :+
          pmod(xxhash64(hashable: _*), lit(tasksPerPartition)): _*)
      }
    routed.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Key-based upsert (MERGE) into a hive-partitioned parquet dataset,
    * rewriting ONLY the partitions the updates touch — the incremental-
    * corpus-update op. Mechanics: collect the updates' distinct partition
    * values (bounded: one row per touched partition), read back just those
    * partitions (partition-pruned scan), anti-join out the rows whose key
    * is being replaced, union the updates, and write with DYNAMIC partition
    * overwrite so untouched partition directories are never rewritten.
    * At 100 TB an update batch touching 3 of 10k partitions costs 3
    * partitions of IO, not a dataset rewrite.
    *
    * Updates must carry the full row schema, and keys must be
    * PARTITION-STABLE: an update row must carry the same partition values
    * as the existing row for that key. Moving a key across partitions needs
    * a delete from the old partition first — the pruned read never sees
    * other partitions, so a moved key would otherwise survive twice.
    * Not transactional across concurrent writers, and the self-read-plus-
    * dynamic-overwrite commit is not crash-atomic either: a driver failure
    * during the overwrite's job commit can leave the touched partitions
    * partially replaced with no rollback. Single-writer, crash-free
    * correctness only — when concurrent writers or crash atomicity matter,
    * use a table format (Iceberg/Delta) whose metadata commit is atomic.
    */
  def upsertPartitionedParquet(updates: DataFrame, path: String,
      keyCols: Seq[String], partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit = {
    require(keyCols.nonEmpty && partitionCols.nonEmpty)
    val spark = updates.sparkSession
    val exists = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    // on the merge path updates feeds three plans (touched collect,
    // anti-join, final union) — persist so the upstream computation runs
    // once; the initial-load path consumes it exactly once, so caching
    // there would only double-materialize the whole dataset
    val up = if (exists) updates.persist() else updates
    try {
      val touched =
        if (!exists) Array.empty[org.apache.spark.sql.Row]
        else up.select(partitionCols.map(col): _*).distinct().collect()
      if (exists && touched.isEmpty) return // empty batch: nothing to merge
      val merged = if (!exists) up else {
        // null-safe <=>: a null partition value must select the
        // __HIVE_DEFAULT_PARTITION__ rows, not evaluate to unknown and
        // drop every existing row of that partition
        val prune = touched.map { r =>
          partitionCols.zipWithIndex
            .map { case (c, i) => col(c) <=> lit(r.get(i)) }
            .reduce(_ && _)
        }.reduce(_ || _)
        val kept = spark.read.parquet(path).filter(prune)
          .join(up.select(keyCols.map(col): _*), keyCols, "left_anti")
        kept.unionByName(up.select(kept.columns.map(col): _*))
      }
      merged.repartition(partitionCols.map(col): _*).write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy(partitionCols: _*)
        .parquet(path)
    } finally up.unpersist()
  }

  /** Range-clustered parquet layout for data skipping: rows are range-
    * partitioned on `clusterCol` and sorted within each task, so every
    * output file covers a DISJOINT value range and parquet min/max stats
    * let a range predicate prune to the few files that can match — at
    * 100 TB the difference between scanning one file and scanning the
    * dataset. `targetFiles` sets the range-partition count (≈ file count;
    * AQE may coalesce empty ranges).
    */
  def clusteredParquet(df: DataFrame, path: String, clusterCol: String,
      targetFiles: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(targetFiles >= 1)
    df.repartitionByRange(targetFiles, col(clusterCol))
      .sortWithinPartitions(col(clusterCol))
      .write.mode(mode).parquet(path)
  }

  /** Z-order clustered parquet: files simultaneously range-local in ALL
    * `clusterCols`, so parquet footer min/max stats prune scans for a
    * predicate on ANY of them — [[clusteredParquet]] skips only on its one
    * sort column. The classic space-filling-curve layout (what Delta /
    * Iceberg `OPTIMIZE ZORDER BY` produces).
    *
    * Mechanics, write-side only: each column is rank-bucketed into
    * 2^bitsPerCol equi-depth buckets against `approxQuantile` boundaries
    * (one bounded driver-side pass over all columns — the same sampled
    * range-ID approach Delta uses), bucket bits are interleaved MSB-first
    * into a Morton code with pure Column bit arithmetic (codegen'd, no
    * UDF), and rows are range-partitioned + sorted by the code — the same
    * single write-side shuffle clusteredParquet pays, so this scales to
    * any corpus the plain writer handles. Equi-depth bucketing makes the
    * layout skew-robust: a hot value floods its own bucket, not the grid.
    *
    * File boundaries align to z-prefix blocks: ranging on the code's top
    * ceil(log2(targetFiles)) bits (equal values never split across range
    * partitions) makes every file a union of WHOLE grid hyperrectangles,
    * so per-file min/max stay tight in every cluster column — ranging on
    * the raw code would let sampled boundaries cut through a block and
    * smear that file across both dimensions. Heavy joint skew merges
    * sparse blocks into fewer, larger files (targetFiles is a target,
    * not a promise — same stance as clusteredParquet on a hot key).
    *
    * Cluster columns must cast to double (numerics, timestamps); NULLs
    * land in the lowest bucket. Reads need no special support: plain
    * parquet row-group stats do the skipping.
    */
  def zorderParquet(df: DataFrame, path: String, clusterCols: Seq[String],
      targetFiles: Int, bitsPerCol: Int = 4,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(clusterCols.size >= 2, "one column: use clusteredParquet")
    require(bitsPerCol >= 1 && bitsPerCol * clusterCols.size <= 62,
      "bitsPerCol * clusterCols must fit a long")
    require(targetFiles >= 1)
    val n = 1 << bitsPerCol
    val probs = (1 until n).map(_.toDouble / n).toArray
    val asDouble = df.select(clusterCols.map(c => col(c).cast("double").as(c)): _*)
    val bounds = asDouble.stat.approxQuantile(clusterCols.toArray, probs, 0.01)
    val nCols = clusterCols.size
    val zName = Iterator.from(0).map(i => s"__zorder$i")
      .find(nm => !df.columns.contains(nm)).get
    val z = clusterCols.zipWithIndex.map { case (c, j) =>
      // equi-depth bucket = #(distinct boundaries <= value); skewed data
      // may repeat a quantile, so dedup keeps buckets ordered and <= n
      val bs = bounds(j).distinct.sorted
      val bucket = bs.foldLeft(lit(0L)) { (acc, b) =>
        acc + when(col(c).cast("double") >= b, 1L).otherwise(0L)
      }
      // MSB-first interleave: bit i of column j -> position
      // i*nCols + (nCols-1-j), so high-order bits of every column
      // dominate the code jointly
      (0 until bitsPerCol).map { i =>
        shiftleft(shiftright(bucket, i).bitwiseAND(lit(1L)),
          i * nCols + (nCols - 1 - j))
      }.reduce(_ + _)
    }.reduce(_ + _)
    val totalBits = bitsPerCol * nCols
    val blockBits = math.min(totalBits,
      if (targetFiles <= 1) 0
      else 64 - java.lang.Long.numberOfLeadingZeros((targetFiles - 1).toLong))
    df.withColumn(zName, z)
      .repartitionByRange(targetFiles, shiftright(col(zName), totalBits - blockBits))
      .sortWithinPartitions(col(zName))
      .drop(zName)
      .write.mode(mode).parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into files sized
    * ~`targetFileBytes` — the maintenance op every long-running ingest
    * needs (streaming sinks and per-batch appends accrete thousands of
    * KB-scale files; at 100 TB the scan's task-scheduling and footer
    * overhead then dominate the read). File count is sized from the
    * directory's actual on-disk bytes (any Hadoop FS scheme), and the
    * rewrite uses `coalesce` — a NARROW dependency, so the job is pure
    * IO with zero shuffle: each output task concatenates a set of input
    * files. Returns the output file count.
    *
    * Writes to `outPath` (not in place): swapping the compacted directory
    * over the source is a caller-side move, and like
    * [[upsertPartitionedParquet]] that swap is not crash-atomic on a
    * plain filesystem — use a table format when atomicity matters. For a
    * hive-partitioned layout, compact per partition directory (file
    * sizing is only meaningful within one partition's files).
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 512L << 20): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var totalBytes = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) totalBytes += f.getLen
    }
    val wanted = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inPath)
    // coalesce cannot INCREASE partitions: a target below
    // spark.sql.files.maxPartitionBytes would otherwise silently produce
    // scan-sized files while reporting the requested count
    val nFiles = math.min(wanted, math.max(1, df.rdd.getNumPartitions))
    df.coalesce(nFiles).write.mode(SaveMode.Overwrite).parquet(outPath)
    nFiles
  }

  /** O4: null sink (validation/benchmark). */
  def noop(df: DataFrame): Unit = df.write.mode(SaveMode.Overwrite).format("noop").save()

  /** Bucketed table write: pre-shuffled layout so future equi-joins and
    * aggregations on `bucketCols` are exchange-free (SortMergeJoin with no
    * Exchange on either side). Requires the session catalog (saveAsTable).
    */
  def bucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}

/** Pluggable queue seam (reference `QueueClient`,
  * `etl-core/src/queue/mod.rs:14-31`; SQS impl
  * `etl-aws-utils/src/sqs_queue.rs:26-58`): push computes a content-derived
  * dedup id (the SQS FIFO `message_deduplication_id` = md5 of the body) and
  * returns it; duplicate pushes of the same body collapse to one message.
  * `FileQueue` is the local implementation; an SQS/Kafka client implements
  * the same trait (no AWS credentials or SDK in this environment to
  * exercise a live one — the md5-dedup-id semantics are oracle-checked by
  * `o5_dedup_id`).
  */
trait QueueClient {
  /** Enqueue a message; returns its dedup id (md5 of the body). */
  def push(msgJson: String): String
  /** Dequeue the oldest message, if any. */
  def pop(): Option[String]
  def size: Long
}

object QueueClient {
  /** SQS-parity dedup id: lowercase-hex md5 of the message body. */
  def dedupId(msgJson: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(msgJson.getBytes("UTF-8")).map("%02x".format(_)).mkString
}

/** In-memory QueueClient (the reference's `Mock` queue): FIFO with
  * content-dedup — a repeated body re-uses its dedup id and is not
  * enqueued twice while the original is still queued.
  */
final class InMemoryQueue extends QueueClient {
  private val q = new java.util.LinkedHashMap[String, String]()
  def push(msgJson: String): String = synchronized {
    val id = QueueClient.dedupId(msgJson)
    q.putIfAbsent(id, msgJson)
    id
  }
  def pop(): Option[String] = synchronized {
    val it = q.entrySet().iterator()
    if (!it.hasNext) None
    else { val e = it.next(); it.remove(); Some(e.getValue) }
  }
  def size: Long = synchronized(q.size().toLong)
}

/** File-based queue (reference O7: `LocalFs`/`Mock` QueueClient — JSON doc
  * per message under a directory, `fs.rs:132-148`): the handoff pattern
  * between pipeline stages that don't share a process. push = atomic file
  * drop keyed by content hash; pop = lexicographically-first doc;
  * asSource = the whole directory as a DataFrame (and, streaming, a
  * file-stream source — see graft.streaming).
  */
final class FileQueue(dir: String) extends QueueClient {
  private val root = java.nio.file.Paths.get(dir)
  java.nio.file.Files.createDirectories(root)

  def push(msgJson: String): String = {
    val key = QueueClient.dedupId(msgJson)
    val tmp = root.resolve(s".$key.tmp")
    java.nio.file.Files.write(tmp, msgJson.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, root.resolve(s"$key.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    key
  }

  /** Run f over the directory stream, always closing it (fd-leak-free). */
  private def withListing[T](f: Iterator[java.nio.file.Path] => T): T = {
    val stream = java.nio.file.Files.list(root)
    try {
      val it = stream.iterator()
      f(new Iterator[java.nio.file.Path] {
        def hasNext = it.hasNext; def next() = it.next()
      })
    } finally stream.close()
  }

  def pop(): Option[String] = {
    val first = withListing {
      _.filter(_.getFileName.toString.endsWith(".json"))
        .reduceOption((a, b) =>
          if (a.getFileName.toString <= b.getFileName.toString) a else b)
    }
    first.map { p =>
      val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      java.nio.file.Files.delete(p)
      s
    }
  }

  def size: Long = withListing(_.count(_.getFileName.toString.endsWith(".json")))
}

/** C8: file listing with glob + regex filter
  * (`etl-aws-utils/src/s3_utils.rs:17-106` — paginated ListObjectsV2 with
  * prefix/regex). Hadoop FS globStatus covers local, HDFS, and S3A alike.
  */
object FileListing {
  def list(spark: org.apache.spark.sql.SparkSession, glob: String,
      regex: Option[String] = None): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(glob)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(path)).getOrElse(Array.empty)
      .map(_.getPath.toString)
    regex.fold(matched.toSeq)(r => matched.filter(_.matches(r)).toSeq)
  }
}
