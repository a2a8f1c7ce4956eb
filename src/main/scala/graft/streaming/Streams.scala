package graft.streaming

import graft.etl.ErrorTolerant
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming forms of the dataflow operators.
  *
  * The reference's "streaming" is bounded tokio streams plus unbounded
  * generators/queue consumers (`enumerate.rs:8-9`, `queue/mod.rs:14-31`) with
  * no event-time semantics. Spark-native streaming adds what the reference
  * lacks: watermarks, windowed/session aggregation, exactly-once sinks via
  * checkpointing (which also subsumes the reference's resume-at-index replay
  * — the checkpoint IS the durable "index").
  *
  * Scale notes: all stateful ops shuffle by key with state in the state
  * store (RocksDB-backed on a real cluster); watermarks bound state size —
  * never aggregate an unbounded stream without one.
  */
object Streams {

  /** Streaming error-tolerant decode: the errors-as-data semantic
    * (PERMISSIVE + corrupt column) applied to a file stream — D1/D2 over an
    * unbounded directory of drops.
    */
  def decodeJsonStream(spark: SparkSession, pathGlob: String,
      schema: StructType): DataFrame =
    spark.readStream
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", ErrorTolerant.CorruptCol)
      .schema(schema.add(ErrorTolerant.CorruptCol, "string"))
      .json(pathGlob)
      .withColumn("source", input_file_name())
      .withColumn("is_error", col(ErrorTolerant.CorruptCol).isNotNull)

  /** S7/S10 streaming analog: rate-limited generator source (the reference's
    * `pause`-throttled EnumerateStream).
    */
  def rateSource(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()

  /** Watermarked tumbling-window aggregation over an event stream. */
  def windowedEventAgg(events: DataFrame, tsCol: String, watermark: String,
      windowDur: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Session windows (gap-based) per key — built-in `session_window`. */
  def sessionWindows(events: DataFrame, tsCol: String, gap: String,
      keyCol: String): DataFrame =
    events
      .withWatermark(tsCol, "0 seconds")
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming exact-dedup across micro-batches: keep the FIRST record per
    * key ever seen, drop all later ones — `mapGroupsWithState` keyed state.
    * The streaming form of Dedup.exact for continuous ingestion pipelines.
    */
  def streamingDedupByKey[T](ds: Dataset[T], key: T => String)(
      implicit e: org.apache.spark.sql.Encoder[T],
      oe: org.apache.spark.sql.Encoder[Option[T]]): Dataset[T] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)
      .mapGroupsWithState[Boolean, Option[T]](GroupStateTimeout.NoTimeout) {
        (_: String, items: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) None
          else { state.update(true); items.nextOption() }
      }
      .flatMap(_.toSeq)
  }

  /** Stream-static enrichment join: a stream joined to a (small) dimension
    * DataFrame — Spark broadcasts the static side per micro-batch, so the
    * stream is enriched map-side with no stateful shuffle.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keys)

  /** Streaming error budget — the reference's `max_errors` abort
    * (`etl-job/src/job.rs:258-263`) applied to an unbounded decode stream:
    * corrupt rows are counted per micro-batch; once the cumulative count
    * crosses the budget the query is stopped (from a monitor thread — a
    * stream cannot stop itself from inside foreachBatch). Good rows go to
    * `sink`; the returned counter exposes progress.
    */
  def decodeWithErrorBudget(decoded: DataFrame, checkpoint: String,
      maxErrors: Long, sink: DataFrame => Unit):
      (org.apache.spark.sql.streaming.StreamingQuery,
        java.util.concurrent.atomic.AtomicLong) = {
    val errors = new java.util.concurrent.atomic.AtomicLong()
    val query = decoded.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.persist()
        try {
          // deliver the batch before charging the budget: the budget aborts
          // BETWEEN micro-batches (reference checks between records/steps),
          // never by killing a half-delivered batch
          sink(cached.filter(!col("is_error")))
          errors.addAndGet(cached.filter(col("is_error")).count())
        } finally { cached.unpersist() }
        ()
      }
      .start()
    val monitor = new Thread(() => {
      while (query.isActive) {
        if (errors.get() > maxErrors) query.stop()
        Thread.sleep(50)
      }
    }, "graft-error-budget-monitor")
    monitor.setDaemon(true)
    monitor.start()
    (query, errors)
  }

  /** J2 fan-out for streams: one source, N sinks, single read per
    * micro-batch (persist inside foreachBatch) — the streaming splitter.
    */
  def fanOutForeachBatch(stream: DataFrame, checkpoint: String,
      sinks: Seq[(String, DataFrame => Unit)]): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.persist()
        try { cached.count(); sinks.foreach { case (_, sink) => sink(cached) } }
        finally { cached.unpersist() }
        ()
      }
      .start()
}
