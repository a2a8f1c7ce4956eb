package graft.streaming

import graft.llm.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Composed end-to-end pipelines — the "switch from the reference" story in
  * one place: continuous corpus ingestion with the full LLM-data treatment,
  * each stage one of the library's operators.
  */
object Pipelines {

  /** Continuous corpus ingestion:
    *
    *   raw NDJSON drops
    *     → error-tolerant decode (corrupt rows split off, counted)
    *     → canonical normalization (TextOps.normalize)
    *     → streaming exact-dedup on the normalized content key
    *       (keyed state, first occurrence wins, across micro-batches)
    *     → quality gate (TextOps.qualityScore ≥ minQuality)
    *     → scored output stream
    *
    * Everything is per-key-state or map-only: the stream shuffles once (on
    * the dedup key) regardless of volume. Input schema must contain
    * (doc_id LONG, text STRING).
    */
  def corpusIngest(spark: SparkSession, pathGlob: String, schema: StructType,
      minQuality: Double): DataFrame = {
    import spark.implicits._
    val decoded = Streams.decodeJsonStream(spark, pathGlob, schema)
      .filter(!col("is_error"))
      .withColumn("norm_text", TextOps.normalize(col("text")))
      .withColumn("norm_key", md5(col("norm_text")))
    val deduped: Dataset[(String, Long, String)] = Streams.streamingDedupByKey(
      decoded.select(col("norm_key"), col("doc_id").cast("long"), col("norm_text"))
        .as[(String, Long, String)],
      (r: (String, Long, String)) => r._1)
    deduped.toDF("norm_key", "doc_id", "norm_text")
      .withColumn("quality", TextOps.qualityScore(col("norm_text")))
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"), col("norm_key"), col("quality"))
  }
}
