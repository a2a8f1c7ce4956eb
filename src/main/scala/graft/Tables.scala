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
  /** events.ts is parquet TIMESTAMP(NANOS): read as long nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
    * integral `div`, not `/`, because ns-since-2024 exceeds double's 2^53
    * exact-integer range.
    */
  def events: DataFrame = apply("events")
    .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents: DataFrame  = apply("documents")
  def embeddings: DataFrame = apply("embeddings")
}
