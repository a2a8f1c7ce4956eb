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

object Tables {

  /** Pinned column→type contract for every driver-provided table.
    *
    * Each column lists the set of acceptable Spark read types
    * (`DataType.simpleString`). Timestamp columns accept all encodings the
    * driver has shipped across test-data generations: parquet TIMESTAMP
    * (MICROS) surfaces as `timestamp` or `timestamp_ntz` depending on the
    * writer's isAdjustedToUTC flag, and TIMESTAMP(NANOS) surfaces as `bigint`
    * under `spark.sql.legacy.parquet.nanosAsLong` — `Tables.events` normalizes
    * all three. Anything outside these sets is a regeneration drift that
    * [[schemaDrift]] reports by table/column/type, so the failure reads
    * "events.ts changed type", not an opaque oracle-hash mismatch.
    */
  private val Ts: Set[String] = Set("timestamp", "timestamp_ntz", "bigint")

  val ExpectedSchemas: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Ts, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Ts),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> Ts,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int"))
  )

  /** Compare every driver table's read schema against [[ExpectedSchemas]] and
    * return one human-readable line per drift (missing column, changed type,
    * or unexpected new column). Empty result = contract holds. Runs one
    * footer-only schema read per table — no data scan.
    */
  def schemaDrift(spark: SparkSession, dir: String): Seq[String] = {
    val t = Tables(spark, dir)
    ExpectedSchemas.toSeq.sortBy(_._1).flatMap { case (table, expected) =>
      val actual = t(table).schema.map(f => f.name -> f.dataType.simpleString).toMap
      val missing = expected.collect {
        case (col, types) if !actual.contains(col) =>
          s"$table.$col: column missing (expected one of ${types.mkString("/")})"
      }
      val drifted = expected.collect {
        case (col, types) if actual.contains(col) && !types(actual(col)) =>
          s"$table.$col: read type ${actual(col)}, expected one of ${types.mkString("/")}"
      }
      val extra = (actual.keySet -- expected.map(_._1)).toSeq.sorted.map { col =>
        s"$table.$col: unexpected new column of type ${actual(col)}"
      }
      missing ++ drifted ++ extra
    }
  }
}
