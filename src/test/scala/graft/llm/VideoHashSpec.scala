package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  test("decode roundtrip: JDK sequence writer → reader preserves frame count and hashes") {
    val clip = VideoHash.synthGif(7L, 64, 48, 5)
    val frames = VideoHash.decodeFrames(clip)
    assert(frames.length === 5)
    // GIF palettizes losslessly here (≤ 8 grey levels), so every frame's
    // aHash equals the hash of the pre-encode scene
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(ImageHash.aHash64(ImageHash.cellLumas(f)) ===
        ImageHash.aHash64(ImageHash.cellLumas(
          ImageHash.synthImage(7L * 1000003L + i, 64, 48))), s"frame $i")
    }
    assert(VideoHash.decodeFrames("not a gif".getBytes).isEmpty)
  }

  test("planted recall: resized+truncated renditions collapse, distinct clips never merge") {
    val clips = (1L to 12L).flatMap { id =>
      val base = (id, VideoHash.synthGif(id, 64, 48, 4))
      if (id % 3 == 0)
        Seq(base, (id + 100L, VideoHash.synthGifSlice(id, 96, 72, 1, 4)))
      else Seq(base)
    } :+ (999L, "junk bytes".getBytes.toSeq.toArray)
    val kept = VideoHash.dropNearDuplicates(
      clips.toDF("media_id", "media"), "media_id", "media")
      .select("media_id").collect().map(_.getLong(0)).toSet
    // every rendition dropped onto its base; undecodable 999 survives
    assert(kept === ((1L to 12L).toSet + 999L))
  }

  test("temporal64: order-sensitive — equal for a re-encode, different for a slice") {
    def t64(bytes: Array[Byte]) = VideoHash
      .videoHashes(Seq((1L, bytes)).toDF("id", "media"), "id", "media")
      .head().temporal64
    val a = t64(VideoHash.synthGif(3L, 64, 48, 4))
    // the same scenes re-rendered at an aHash-exact resolution fold equally
    assert(a === t64(VideoHash.synthGifSlice(3L, 96, 72, 0, 4)))
    assert(a !== t64(VideoHash.synthGifSlice(3L, 64, 48, 1, 4)))
  }

  test("vsReference: best-ref flagging, no-match sentinel, broadcast guard") {
    val corpus = Seq(
      (1L, VideoHash.synthGif(5L, 64, 48, 4)),
      (2L, VideoHash.synthGif(6L, 64, 48, 4)),
      (9L, "junk".getBytes)).toDF("media_id", "media")
    val ref = Seq(
      (100L, VideoHash.synthGifSlice(5L, 96, 72, 1, 4))).toDF("media_id", "media")
    val got = VideoHash.vsReference(corpus, ref, "media_id", "media")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    // clip 1 shares the rendition's all-3 frames → share 1000 of the
    // smaller; clip 2 and the undecodable row report the sentinel
    assert(got(1L) === ((100L, 3L, 1000L, true)))
    assert(got(2L) === ((-1L, 0L, 0L, false)))
    assert(got(9L) === ((-1L, 0L, 0L, false)))
    val e = intercept[IllegalArgumentException] {
      VideoHash.vsReference(corpus, ref, "media_id", "media",
        maxRefFrames = 1L)
    }
    assert(e.getMessage.contains("maxRefFrames"))
  }

  test("nearDupPairs reports shared counts and share fraction") {
    val df = Seq(
      (1L, VideoHash.synthGif(5L, 64, 48, 4)),
      (2L, VideoHash.synthGifSlice(5L, 96, 72, 1, 4)),
      (3L, VideoHash.synthGif(6L, 64, 48, 4))).toDF("media_id", "media")
    val p = VideoHash.nearDupPairs(
      VideoHash.videoHashes(df, "media_id", "media")).collect()
    assert(p.length === 1)
    val r = p.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((1L, 2L, 3L, 1000L)))
  }
}
