package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every query receives `(spark, sfDir)` and resolves tables through here so
  * the same code runs at any scale factor — and, on a real cluster, against
  * any warehouse path. Reads are plain `spark.read.parquet`, which keeps
  * column pruning and predicate pushdown available to Catalyst (verified via
  * `.explain`: `PushedFilters` / `ReadSchema` reach the scan).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def apply(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = apply("region")
  def nation: DataFrame     = apply("nation")
  def customer: DataFrame   = apply("customer")
  def supplier: DataFrame   = apply("supplier")
  def part: DataFrame       = apply("part")
  def orders: DataFrame     = apply("orders")
  def lineitem: DataFrame   = apply("lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across test-data generations, so dispatch on the type
    * actually read instead of assuming one:
    *   - LongType: the NANOS form surfaced by
    *     `spark.sql.legacy.parquet.nanosAsLong` — truncate to micros with
    *     integral `div` (ns-since-2024 exceeds double's 2^53 exact range).
    *   - TIMESTAMP_NTZ / TIMESTAMP: the MICROS form — cast to session-TZ
    *     TimestampType (identity on wall-clock under the UTC session) so every
    *     consumer sees the same type either way.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val df = apply("events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents: DataFrame  = apply("documents")
  def embeddings: DataFrame = apply("embeddings")
}
