package graft

import org.apache.spark.sql.functions._

/** Locks the driver-testdata contract (VERDICT r6 #2/#8, carried to r7 #1):
  *
  *  1. a per-table schema tripwire that fails with the drifted column/type by
  *     name — the next testdata regeneration surfaces as "events.ts changed
  *     type", not as an opaque oracle-hash mismatch three suites away;
  *  2. a dual-encoding golden for `Tables.events`: the same wall-clock rows
  *     written as parquet TIMESTAMP(MICROS) and as int64 nanoseconds (the
  *     shape TIMESTAMP(NANOS) takes under
  *     `spark.sql.legacy.parquet.nanosAsLong`) must load identically.
  */
class TablesSpec extends SparkSpec {

  test("driver table schemas match the pinned contract (tripwire names the column)") {
    val drift = Tables.schemaDrift(spark, sf0001)
    assert(drift.isEmpty, "testdata schema drift detected:\n" + drift.mkString("\n"))
  }

  test("events loader: MICROS and NANOS parquet encodings load identically") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-events-golden").toString
    val base = Seq(
      (1L, "2024-01-01 00:00:00.123456", 10L, "click", 1.5, "{}"),
      (2L, "2024-06-15 23:59:59.999999", 11L, "view", 2.0, """{"k":1}"""),
      (3L, "2025-02-28 12:00:00.000001", 12L, "click", 0.0, "{}")
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp($"ts_s"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    base.write.mode("overwrite").parquet(s"$tmp/micros/events.parquet")
    // NANOS form: int64 ns-since-epoch, plus a 999 ns sub-microsecond remainder
    // the loader must TRUNCATE (integral div), not round up to the next micro.
    base.withColumn("ts", expr("unix_micros(ts) * 1000L + 999"))
      .write.mode("overwrite").parquet(s"$tmp/nanos/events.parquet")

    val micros = Tables(spark, s"$tmp/micros").events
    val nanos  = Tables(spark, s"$tmp/nanos").events
    assert(micros.schema("ts").dataType === nanos.schema("ts").dataType,
      "normalized ts type differs between encodings")
    val a = micros.orderBy("event_id").collect().toSeq
    val b = nanos.orderBy("event_id").collect().toSeq
    assert(a === b, s"row drift between encodings:\nmicros=$a\nnanos =$b")
  }

  test("schemaDrift names a drifted column in its message") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift").toString
    // region with r_name re-typed to bigint: the tripwire must call it out.
    Seq((0, 1L), (1, 2L)).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$tmp/region.parquet")
    val t = Tables(spark, tmp)
    val actual = t("region").schema.map(f => f.name -> f.dataType.simpleString).toMap
    val expected = Tables.ExpectedSchemas("region")
    val drift = expected.collect {
      case (col, types) if actual.contains(col) && !types(actual(col)) =>
        s"region.$col: read type ${actual(col)}, expected one of ${types.mkString("/")}"
    }
    assert(drift.exists(_.contains("region.r_name: read type bigint")), drift.mkString("\n"))
  }
}
