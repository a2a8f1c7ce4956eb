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
      .schema(ErrorTolerant.withCorrupt(schema))
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
    * key ever seen, drop all later ones — `flatMapGroupsWithState` keyed
    * state in Append mode, so the result composes with file sinks (the
    * natural target of an ingestion pipeline; `mapGroupsWithState` would
    * force Update mode, which file sinks reject).
    */
  def streamingDedupByKey[T](ds: Dataset[T], key: T => String)(
      implicit e: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, items: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); items.take(1) }
      }
  }

  /** `streamingDedupByKey` with bounded state: each key's entry expires
    * `ttlMs` after its latest occurrence (event time), after which the key
    * is admitted again. THIS is the 100 TB ingestion form — `NoTimeout`
    * state grows with the number of distinct keys ever seen, which on an
    * unbounded corpus stream is itself unbounded; an event-time TTL caps
    * state at (keys seen within one TTL window) at the cost of re-admitting
    * a duplicate that recurs after the window.
    *
    * The input must carry a watermark on an event-time column (call
    * `.withWatermark` upstream); `eventTimeMs` extracts that column's epoch
    * millis from the record. Expiry rides the watermark: state for a key is
    * dropped once the watermark passes lastSeen + ttl.
    */
  def streamingDedupByKeyExpiring[T](ds: Dataset[T], key: T => String,
      eventTimeMs: T => Long, ttlMs: Long)(
      implicit e: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)
      .flatMapGroupsWithState[Long, T](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, items: Iterator[T], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val seenBefore = state.exists
            val newest = items.foldLeft((Option.empty[T], Long.MinValue)) {
              case ((first, mx), t) =>
                (first.orElse(Some(t)), math.max(mx, eventTimeMs(t)))
            }
            val last = math.max(state.getOption.getOrElse(Long.MinValue), newest._2)
            state.update(last)
            // timeout must sit above the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(last + ttlMs, state.getCurrentWatermarkMs() + 1))
            if (seenBefore) Iterator.empty else newest._1.iterator
          }
      }
  }

  /** Streaming k-anonymity release gate ([[graft.llm.Privacy]] on a
    * stream): rows are HELD in keyed state until their quasi-identifier
    * group has accumulated `k` rows, then the whole backlog plus every
    * later row of that group is released. Group counts only grow, so the
    * released set converges to exactly the batch
    * [[graft.llm.Privacy.suppressSmallGroups]] answer over everything
    * ingested — the streamed form of the release gate, with the privacy
    * property holding at every intermediate moment (no group is ever
    * visible below size k).
    *
    * State is BOUNDED BY CONSTRUCTION at ≤ k−1 buffered rows per QI
    * group (once released, state collapses to a released marker), so
    * unbounded streams cost (distinct groups) · (k−1) rows of state —
    * the operator's scale contract, no TTL needed.
    */
  def kAnonReleaseGate[T](ds: Dataset[T], quasiKey: T => String, k: Int)(
      implicit e: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    require(k >= 1, s"k must be >= 1, got $k")
    import ds.sparkSession.implicits._
    // state: (buffer, released) — buffer is empty once the group is open.
    // Kryo for the state (a generic Seq[T] has no derivable expression
    // encoder); state never leaves the state store, so the row-encoder
    // benefits don't apply to it anyway
    implicit val stateEnc: org.apache.spark.sql.Encoder[(Seq[T], Boolean)] =
      org.apache.spark.sql.Encoders.kryo[(Seq[T], Boolean)]
    ds.groupByKey(quasiKey)
      .flatMapGroupsWithState[(Seq[T], Boolean), T](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, items: Iterator[T], state: GroupState[(Seq[T], Boolean)]) =>
          if (state.getOption.exists(_._2)) items // group already public
          else {
            val buf = state.getOption.map(_._1).getOrElse(Seq.empty) ++
              items.toSeq
            if (buf.size >= k) { state.update((Seq.empty, true)); buf.iterator }
            else { state.update((buf, false)); Iterator.empty }
          }
      }
  }

  /** Stream-static enrichment join: a stream joined to a (small) dimension
    * DataFrame — Spark broadcasts the static side per micro-batch, so the
    * stream is enriched map-side with no stateful shuffle. Left-outer:
    * events with no dimension match pass through with nulls (an enrichment
    * must never silently drop late-registered keys).
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left_outer")

  /** Stream-stream interval join (streaming attribution: the unbounded form
    * of `Joins.rangeJoinBinned`): left and right streams equi-join on `keys`
    * with `right.ts` in `[left.ts, left.ts + window]`. BOTH sides carry a
    * watermark and the join condition bounds the time difference — that pair
    * of constraints is what lets Spark evict buffered rows once the
    * watermark passes, so join state stays bounded on an unbounded stream
    * (without them, stream-stream join state grows forever).
    *
    * `delay` is each side's lateness allowance; state retention ≈
    * `delay + window` per side. Timestamp columns must be named distinctly
    * (`leftTs`/`rightTs`); output is an inner join (Append mode).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, window: String,
      delay: String = "1 minute"): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    val keyCond = keys.map(k => l(k) === r(k))
    val timeCond = r(rightTs) >= l(leftTs) &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $window")
    val joined = l.join(r, (keyCond :+ timeCond).reduce(_ && _), "inner")
    // drop the right side's duplicated key columns
    keys.foldLeft(joined)((df, k) => df.drop(r(k)))
  }

  /** Streaming error budget — the reference's `max_errors` abort
    * (`etl-job/src/job.rs:258-263`) applied to an unbounded decode stream:
    * corrupt rows are counted per micro-batch; once the cumulative count
    * crosses the budget, later micro-batches are skipped (gate checked at
    * the START of each foreachBatch, so a tripped budget never delivers
    * again even before the stop lands) and a monitor thread stops the
    * query. Charging is deduplicated by batchId so an at-least-once
    * foreachBatch retry cannot double-count a batch. Good rows go to
    * `sink`; the returned counter exposes progress.
    *
    * Delivery itself remains at-least-once on retry (Spark's foreachBatch
    * contract) — idempotent sinks or batchId-keyed writes give effective
    * exactly-once, as usual.
    */
  def decodeWithErrorBudget(decoded: DataFrame, checkpoint: String,
      maxErrors: Long, sink: DataFrame => Unit):
      (org.apache.spark.sql.streaming.StreamingQuery,
        java.util.concurrent.atomic.AtomicLong) = {
    val errors = new java.util.concurrent.atomic.AtomicLong()
    val lastCharged = new java.util.concurrent.atomic.AtomicLong(-1L)
    val query = decoded.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (errors.get() <= maxErrors) {
          val cached = batch.persist()
          try {
            // count FIRST, but mark the batch charged only after both the
            // count and the sink succeeded: a throw from either leaves
            // lastCharged untouched, so the foreachBatch retry still charges
            // this batch (marking before counting silently under-counted the
            // budget). Charging after the sink also keeps this batch's good
            // rows flowing before the monitor can observe the tripped budget.
            val batchErrors = cached.filter(col("is_error")).count()
            sink(cached.filter(!col("is_error")))
            if (lastCharged.getAndSet(batchId) != batchId)
              errors.addAndGet(batchErrors)
          } finally { cached.unpersist() }
        }
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

  /** Per-key running statistics emitted on every update —
    * `flatMapGroupsWithState` with explicit keyed state: the general
    * custom-state escape hatch (arbitrary per-key accumulators, emit-on-
    * change), complementing mapGroupsWithState (dedup) and session_window
    * (sessions). State is (count, sum); each micro-batch emits the new
    * running values for keys it touched.
    */
  def runningStatsByKey(ds: Dataset[(String, Double)]):
      Dataset[(String, Long, Double)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (String, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, items: Iterator[(String, Double)],
            state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          items.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          if (n == n0) Iterator.empty else Iterator((key, n, s))
      }
  }

  /** J2 fan-out for streams: one source, N sinks, single read per
    * micro-batch — the streaming splitter, delegating each batch to the
    * batch splitter (`graft.etl.Transforms.fanOut`) so the two forms cannot
    * drift.
    */
  def fanOutForeachBatch(stream: DataFrame, checkpoint: String,
      sinks: Seq[DataFrame => Unit]): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.Transforms.fanOut(batch, sinks)
        ()
      }
      .start()

  /** Continuous data monitoring: profile every micro-batch
    * (`etl.Profile.profile` — nulls/ndv/min/max per column) and hand the
    * batch_id-stamped stats to `sink` (append to a stats table, or gate
    * through [[graft.etl.Profile.drift]] against a trusted baseline and
    * alert). The profile is one agg over the batch; the stats frame is
    * |columns| rows — monitoring cost is a rounding error next to the
    * pipeline it watches, at any scale.
    */
  def profilePerBatch(stream: DataFrame, checkpoint: String,
      cols: Seq[String] = Nil)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(graft.etl.Profile.profile(batch, cols)
          .withColumn("batch_id", lit(id)))
        ()
      }
      .start()
}
