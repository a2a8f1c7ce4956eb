package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque media bytes + typed metadata. */
case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)
case class MediaRecord(media_id: Long, media: Array[Byte], meta: MediaMeta)
/** Extracted feature row: fixed-width embedding + provenance. */
case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Float])

/** Multimodal column plumbing.
  *
  * Design: image/audio/video are opaque `binary` columns with a typed
  * metadata struct, processed per-partition in bounded batches so decode
  * libraries amortize setup and memory stays flat regardless of corpus size.
  * The actual codec calls are STUBBED (`decodeStub`) — this container has no
  * image/audio libraries — with a deterministic fake, so the Spark-side
  * contract (schema, batch shape, partitioning, feature width) is real and
  * tested while the codec is swappable.
  */
object Multimodal {

  val FeatureDim = 16
  val BatchSize = 64

  /** STUB decode: deterministic fake "decoded frame" derived from the bytes
    * themselves (md5-folded). Replace with a real codec (JNI/FFI) in
    * production; signature and batch shape stay identical.
    */
  def decodeStub(media: Array[Byte]): Array[Float] = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(media)
    Array.tabulate(FeatureDim)(i => (d(i % d.length) & 0xff) / 255.0f)
  }

  /** Feature extraction over batches: mapPartitions with `grouped(BatchSize)`
    * mirrors vectorized UDF batch shape — one codec context per partition,
    * bounded batch memory.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec context would be opened here
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          MediaFeatures(r.media_id, r.media.length.toLong, decodeStub(r.media))
        }
      }
    }
  }

  /** "Resize" metadata transform (pure-plan, no decode): clamp dimensions. */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("meta.width"), col("meta.height")).cast("double"))
    df.withColumn("meta", struct(
      col("meta.format").as("format"),
      floor(col("meta.width") * scale).cast("int").as("width"),
      floor(col("meta.height") * scale).cast("int").as("height"),
      col("meta.durationMs").as("durationMs")))
  }

  /** Frame-sample plan: one row per sampled frame index (no decode — the
    * sampling grid is pure arithmetic; pair with extractFeatures for bytes).
    */
  def frameSamplePlan(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L), greatest(col("meta.durationMs") - 1, lit(0L)),
          lit(everyMs))))
      .select(col("media_id"), col("frame_ms"))

  /** Build a media table from any (id, string) source — used by tests and
    * the driver queries to exercise binary plumbing on the documents table.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      col(textCol).cast("binary").as("media"),
      struct(lit("text/plain").as("format"),
        length(col(textCol)).as("width"), lit(1).as("height"),
        length(col(textCol)).cast("long").as("durationMs")).as("meta"))
}
