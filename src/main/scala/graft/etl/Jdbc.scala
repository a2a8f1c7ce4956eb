package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.sql.{Connection, DriverManager, PreparedStatement}

/** JDBC source/sink (reference S3 `MySqlSelect` / O3 `MySqlDataOutput`).
  *
  * Source: `spark.read.format("jdbc")` with either a pushed-down query or a
  * partitioned column read — the distributed analog of the reference's
  * row-streamed SELECT (`etl-mysql/src/datastore.rs:44-62,624-666`).
  *
  * Sink: the reference micro-batches INSERTs (`on_put_num_rows` rows per
  * statement, 4 MB packet guard) and on batch failure degrades to row-by-row
  * retry, shunting still-failing rows to a dead-letter channel
  * (`etl-mysql/src/datastore.rs:142-323`, fallback `:264-288`).
  * `writeBatchedWithDeadLetter` keeps that semantic but improves on the
  * reference's known double-insert flaw by wrapping each batch in a
  * transaction (commit per batch, rollback before the row-wise retry).
  * Failed rows come back as a DataFrame (JSON + error) — a quarantine
  * *table*, queryable and re-playable, instead of an in-process channel.
  */
object Jdbc {

  def read(spark: SparkSession, url: String, query: String,
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
      spark.read.format("jdbc").option("url", url).option("query", query)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

  /** Partition-parallel read over a numeric column — the scale path. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** Plain batched append via Spark's JDBC writer (JDBC `batchsize` maps the
    * reference's `on_put_num_rows`).
    */
  def writeBatched(df: DataFrame, url: String, table: String, batchSize: Int): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize)
      .mode("append").save()

  /** Batched insert with row-wise degradation and a dead-letter result.
    *
    * Returns a MATERIALIZED DataFrame (row_json STRING, error STRING) of
    * rows that failed even individually: the insert runs eagerly exactly
    * once here (persist + count) — re-reading the returned quarantine frame
    * never re-runs the side effect. One connection per partition; each
    * batch is a transaction, rolled back before the row-wise retry, so a
    * failing batch never half-commits.
    *
    * Delivery is at-least-once under Spark TASK retries (a batch committed
    * before an executor crash is re-attempted by the retried task — the
    * same guarantee every non-transactional JDBC writer has); use a staging
    * table + MERGE for exactly-once.
    */
  /** `mapQuery` is the reference's pre-write rewrite hook
    * (`etl-mysql/src/datastore.rs` `map_query`): it receives the generated
    * parameterized INSERT and may rewrite it (INSERT IGNORE, ON DUPLICATE
    * KEY, a different target table) before execution. Row *values* are
    * rewritten Spark-side with `withColumn` before calling — the hook is
    * for statement shape only.
    */
  def writeBatchedWithDeadLetter(df: DataFrame, url: String, table: String,
      batchSize: Int, mapQuery: String => String = identity): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = df.schema
    val cols = schema.fieldNames
    val insertSql = mapQuery(
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})")

    def jsonStr(v: Any): String = v match {
      case null => "null"
      case other =>
        "\"" + other.toString.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\r' => "\\r"
          case '\t' => "\\t"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        } + "\""
    }

    val failed = df.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val conn: Connection = DriverManager.getConnection(url)
        conn.setAutoCommit(false)
        val stmt = conn.prepareStatement(insertSql)
        val deadLetters = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

        def bind(st: PreparedStatement, row: Row): Unit = {
          var i = 0
          while (i < cols.length) { st.setObject(i + 1, row.get(i)); i += 1 }
        }
        def rowJson(row: Row): String =
          cols.zipWithIndex.map { case (c, i) => s""""$c":${jsonStr(row.get(i))}""" }
            .mkString("{", ",", "}")

        try {
          rows.grouped(batchSize).foreach { batch =>
            try {
              batch.foreach { r => bind(stmt, r); stmt.addBatch() }
              stmt.executeBatch()
              conn.commit()
            } catch {
              case _: java.sql.SQLException =>
                stmt.clearBatch() // a bind-failure leaves pending param sets
                conn.rollback() // no partial batch survives
                batch.foreach { r =>
                  try { bind(stmt, r); stmt.executeUpdate(); conn.commit() }
                  catch {
                    case e: java.sql.SQLException =>
                      conn.rollback()
                      deadLetters += ((rowJson(r), e.getMessage))
                  }
                }
            }
          }
        } finally { stmt.close(); conn.close() }
        deadLetters.iterator
      }
    }.toDF("row_json", "error")
    val materialized = failed.persist()
    materialized.count() // run the insert exactly once, now
    materialized
  }
}
