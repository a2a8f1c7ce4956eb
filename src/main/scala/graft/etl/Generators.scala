package graft.etl

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Synthetic / paging sources (reference S7/S8).
  *
  * `EnumerateStream` calls `create(state, idx)` up to `max` times
  * (`etl-core/src/datastore/enumerate.rs:6-135`). Spark-native: the index
  * space is `spark.range(max)` — already partitioned across the cluster —
  * and `create` runs as a map. The async variant (S8: a DB pool paged from a
  * closure) becomes mapPartitions with one client per partition, the
  * idiomatic Spark external-client pattern.
  */
object Generators {

  /** S7: deterministic generator over an index space. */
  def enumerate[O: Encoder](spark: SparkSession, max: Long)(create: Long => O): Dataset[O] = {
    import spark.implicits._
    spark.range(max).map(i => create(i: Long))
  }

  /** S7 with the reference's optional inter-record `pause`
    * (`etl-core/src/datastore/enumerate.rs:6-59`): a PER-PARTITION rate
    * limit, so the aggregate rate is `maxPerSecPerPartition × partitions` —
    * the only sane contract on a cluster (a global limiter would serialize
    * the job through one coordinator). Intended for generators that page a
    * rate-limited external API in batch; for continuous rate-limited
    * streams use the rate source (`Streams.rateSource`). Throttling paces
    * evenly: each record waits until its slot time, so bursts after a slow
    * record catch up without exceeding the average rate.
    */
  def enumerateThrottled[O: Encoder](spark: SparkSession, max: Long,
      maxPerSecPerPartition: Double)(create: Long => O): Dataset[O] = {
    require(maxPerSecPerPartition > 0, "rate must be positive")
    import spark.implicits._
    val nanosPerRecord = (1e9 / maxPerSecPerPartition).toLong
    spark.range(max).mapPartitions { it =>
      val t0 = System.nanoTime()
      var n = 0L
      it.map { i =>
        val slot = t0 + n * nanosPerRecord
        n += 1
        val wait = slot - System.nanoTime()
        if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
        create(i: Long)
      }
    }
  }

  /** S8: generator with per-partition shared state (connection pool, HTTP
    * client...). `open` runs once per partition; `create` per index;
    * `close` on partition completion.
    */
  def enumerateWithClient[C, O: Encoder](spark: SparkSession, max: Long)(
      open: () => C)(create: (C, Long) => O)(close: C => Unit): Dataset[O] = {
    import spark.implicits._
    spark.range(max).mapPartitions { it =>
      val client = open()
      // close exactly once at task completion — fires on normal exhaustion,
      // early stop (limit/take), and failure alike
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; close(client) }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      it.map(i => create(client, i: Long))
    }
  }
}
