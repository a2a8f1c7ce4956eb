package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Per-video frame-hash summary: decode flag, frame count, the ordered
  * per-frame aHash64 list, and an order-sensitive 64-bit temporal fold.
  */
case class VideoHashed(id: Long, decoded: Boolean, n_frames: Long,
    frame_hashes: Array[Long], temporal64: Long)

/** Video near-dup dedup over MULTI-FRAME binary columns, through the one
  * multi-frame codec the JDK ships: animated GIF (`javax.imageio` reads
  * every image descriptor of a sequence natively). The frame-indexed
  * pipeline — decode → per-frame perceptual hash → shared-frame candidate
  * pairing → overlap verify → connected-component survivors — is
  * format-agnostic: a production deployment swaps [[decodeFrames]] for an
  * MP4 keyframe extractor (JNI/FFI) and every stage downstream is
  * unchanged, exactly the [[Multimodal]] swappable-codec contract, except
  * here the in-JDK codec is REAL, so the whole path is testable offline
  * (the [[ImageHash]] round-8 lesson applied to the video leg).
  *
  * Near-dup semantics: two videos pair when they SHARE perceptual frames
  * — robust to re-encoding, resizing (aHash is resolution-stable), frame
  * drops, and truncation, the standard frame-fingerprint video-dedup
  * shape. The temporal fold is the cheap exact-match key: equal folds ⇒
  * same frame sequence (order-sensitive), for registry-style exact video
  * dedup without carrying frame lists.
  *
  * Scale mechanics: one map-only decode pass (bytes never shuffle after
  * it); candidate generation is [[Dedup.pairsWithinBuckets]] on distinct
  * frame hashes (slim (hash, id) rows, capped buckets — a viral intro
  * frame shared by millions of clips cannot turn one task into an n² pair
  * generator); the verify is an `array_intersect` over ≤-frame-count
  * sorted hash arrays on the pairs only.
  */
object VideoHash {

  /** Decode a multi-frame image container (animated GIF in this build)
    * into its frames; empty on undecodable bytes. Full-frame sequences
    * only (our writer emits full frames; partial-frame GIF composition is
    * a codec concern a production extractor would handle).
    */
  def decodeFrames(bytes: Array[Byte]): Seq[BufferedImage] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(
        if (bytes == null) Array.emptyByteArray else bytes))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) Nil
      else {
        val r = readers.next()
        r.setInput(iis)
        val n = r.getNumImages(true)
        val out = (0 until n).map(r.read(_))
        r.dispose()
        out
      }
    } catch { case _: Exception => Nil }

  /** Per-video frame hashes: decode, aHash64 each frame, fold the ordered
    * sequence into the temporal signature. Map-only; bytes never leave
    * the scan task.
    */
  def videoHashes(df: DataFrame, idCol: String,
      binCol: String): Dataset[VideoHashed] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val frames = decodeFrames(bytes)
        if (frames.isEmpty) VideoHashed(id, decoded = false, 0L,
          Array.empty[Long], 0L)
        else {
          val hs = frames.map(f => ImageHash.aHash64(ImageHash.cellLumas(f)))
          var t = 0xda3e39cb94b95bdbL
          hs.foreach { h => t = java.lang.Long.rotateLeft(t, 5) ^ h }
          VideoHashed(id, decoded = true, hs.length.toLong, hs.toArray, t)
        }
      })
  }

  /** Candidate pairs among decoded videos sharing at least one perceptual
    * frame, verified to share ≥ `minShareMilli`/1000 of the SMALLER
    * video's distinct frames. Output: (id_a, id_b, shared, share_milli).
    */
  def nearDupPairs(hashed: Dataset[VideoHashed],
      minShareMilli: Long = 500L,
      maxBucketSize: Int = 10000): DataFrame = {
    require(minShareMilli >= 1 && minShareMilli <= 1000,
      s"minShareMilli must sit in [1, 1000], got $minShareMilli")
    val sets = hashed.toDF().filter(col("decoded"))
      .select(col("id"),
        array_sort(array_distinct(col("frame_hashes"))).as("hs"))
      .localCheckpoint()
    val cand = Dedup.pairsWithinBuckets(
      sets.select(col("id"), explode(col("hs")).as("h")),
      Seq("h"), "id", maxBucketSize)
    cand
      .join(sets.select(col("id").as("id_a"), col("hs").as("ha")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hs").as("hb")), "id_b")
      .withColumn("shared", size(array_intersect(col("ha"), col("hb")))
        .cast("long"))
      .withColumn("share_milli", expr(
        "(shared * 1000) DIV least(size(ha), size(hb))"))
      .filter(col("share_milli") >= minShareMilli)
      .select(col("id_a"), col("id_b"), col("shared"), col("share_milli"))
  }

  /** Incremental shared-frame pairs for the streaming loop: fresh clips
    * (as (id, sorted-distinct hs) sets) vs themselves AND a persisted
    * (id, h) frame index — never index×index (prior batches are already
    * mutually deduped; the fuzzyDedupIngest contract). Assumes fresh and
    * index id sets are disjoint (disjoint batches). Output: (id_a, id_b).
    */
  def nearDupPairsIncremental(freshSets: DataFrame, indexFrames: DataFrame,
      minShareMilli: Long = 500L, maxBucketSize: Int = 10000): DataFrame = {
    val idxSets = indexFrames
      .groupBy(col("id"))
      .agg(array_sort(collect_set(col("h"))).as("hs"))
    val all = freshSets.select(col("id"), col("hs"), lit(true).as("fr"))
      .unionByName(idxSets.select(col("id"), col("hs"),
        lit(false).as("fr")))
      .localCheckpoint()
    Dedup.pairsWithinBuckets(
        all.select(col("id"), explode(col("hs")).as("h")),
        Seq("h"), "id", maxBucketSize)
      .join(all.select(col("id").as("id_a"), col("hs").as("ha"),
        col("fr").as("fa")), "id_a")
      .join(all.select(col("id").as("id_b"), col("hs").as("hb"),
        col("fr").as("fb")), "id_b")
      .filter(col("fa") || col("fb"))
      .withColumn("shared", size(array_intersect(col("ha"), col("hb")))
        .cast("long"))
      .filter(expr("(shared * 1000) DIV least(size(ha), size(hb))") >=
        minShareMilli)
      .select(col("id_a"), col("id_b"))
  }

  /** The full video-dedup story: frame hashes → shared-frame pairs →
    * connected components → min-id survivor. Undecodable rows always
    * survive (they never pair).
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, binCol: String,
      minShareMilli: Long = 500L): DataFrame = {
    val pairs = nearDupPairs(videoHashes(df, idCol, binCol), minShareMilli)
      .select(col("id_a"), col("id_b"))
    Dedup.applySurvivors(df, idCol, Dedup.survivorAssignment(pairs))
  }

  /** Frame-level video DECONTAMINATION vs a reference clip set (an eval
    * suite / takedown registry — bounded by contract): every corpus clip
    * scored against its closest reference by shared-perceptual-frame
    * fraction. The reference's frame hashes ship once per executor as an
    * inverted hash→clip index (the [[Dedup.nearDupsVsReference]] shape);
    * the corpus pass is MAP-ONLY — zero shuffle, exact counts, no recall
    * bound when one side broadcasts.
    *
    * Output: one row per corpus clip
    * `(id, best_ref_id, shared, share_milli, flagged)` — best by
    * (share desc, ref id asc), `best_ref_id = −1` when no frame is
    * shared or the clip is undecodable.
    */
  def vsReference(corpus: DataFrame, reference: DataFrame, idCol: String,
      binCol: String, minShareMilli: Long = 500L,
      maxRefFrames: Long = 1000000L): DataFrame = {
    require(minShareMilli >= 1 && minShareMilli <= 1000,
      s"minShareMilli must sit in [1, 1000], got $minShareMilli")
    val spark = corpus.sparkSession
    import spark.implicits._
    val refSets: Array[(Long, Array[Long])] =
      videoHashes(reference, idCol, binCol)
        .filter(_.decoded)
        .map(v => (v.id, v.frame_hashes.distinct.sorted))
        .collect().sortBy(_._1)
    require(refSets.nonEmpty, "vsReference: empty/undecodable reference")
    val total = refSets.iterator.map(_._2.length.toLong).sum
    require(total <= maxRefFrames,
      s"reference carries $total frames > maxRefFrames $maxRefFrames — " +
        "broadcast would be unbounded; dedup against a bounded suite")
    val refIds = refSets.map(_._1)
    val refSizes = refSets.map(_._2.length)
    val inv = new java.util.HashMap[Long, Array[Int]]()
    refSets.iterator.zipWithIndex.foreach { case ((_, hs), slot) =>
      hs.foreach { h =>
        val prev = inv.get(h)
        inv.put(h, if (prev == null) Array(slot) else prev :+ slot)
      }
    }
    val bIdx = spark.sparkContext.broadcast((inv, refIds, refSizes))
    videoHashes(corpus, idCol, binCol)
      .mapPartitions { it =>
        val (inv, refIds, refSizes) = bIdx.value
        val counts = new Array[Int](refIds.length)
        val touched = new Array[Int](refIds.length)
        it.map { v =>
          val hs = if (v.decoded) v.frame_hashes.distinct else Array.empty[Long]
          var nTouched = 0
          hs.foreach { h =>
            val slots = inv.get(h)
            if (slots != null) slots.foreach { r =>
              if (counts(r) == 0) { touched(nTouched) = r; nTouched += 1 }
              counts(r) += 1
            }
          }
          var bestShare = -1L; var bestRef = -1L; var bestShared = 0L
          var k = 0
          while (k < nTouched) {
            val r = touched(k)
            val shared = counts(r).toLong
            counts(r) = 0
            val share = shared * 1000L / math.min(hs.length, refSizes(r))
            if (share > bestShare ||
                (share == bestShare && refIds(r) < bestRef)) {
              bestShare = share; bestRef = refIds(r); bestShared = shared
            }
            k += 1
          }
          (v.id, bestRef, bestShared, math.max(bestShare, 0L),
            bestShare >= minShareMilli)
        }
      }
      .toDF("id", "best_ref_id", "shared", "share_milli", "flagged")
  }

  // ---------------------------------------------------------------------
  // Deterministic synthetic clips (validation / recall harness): the
  // planted-transform pattern, in video form — seed-derived frame scenes
  // written as a real animated GIF by the JDK's own sequence writer.
  // ---------------------------------------------------------------------

  /** Encode frames as one animated GIF via the JDK writer's sequence API
    * (default per-frame metadata — delay is irrelevant to dedup).
    */
  def encodeGif(frames: Seq[BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "encodeGif needs at least one frame")
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { im =>
      writer.writeToSequence(new javax.imageio.IIOImage(im, null, null),
        null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  /** Deterministic synthetic clip: `nFrames` seed-derived scenes (each
    * frame its own [[ImageHash.synthImage]] seed) at (w, h).
    */
  def synthGif(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] =
    encodeGif((0 until nFrames).map(i =>
      ImageHash.synthImage(seed * 1000003L + i, w, h)))

  /** A re-rendition of [[synthGif]]: same scenes at a different
    * resolution, keeping only frames `from until until` — the planted
    * resize + truncation transform a near-dup pass must recall.
    */
  def synthGifSlice(seed: Long, w: Int, h: Int, from: Int,
      until: Int): Array[Byte] =
    encodeGif((from until until).map(i =>
      ImageHash.synthImage(seed * 1000003L + i, w, h)))
}
