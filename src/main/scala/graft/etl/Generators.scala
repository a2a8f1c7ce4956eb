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
