package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual-hash image dedup: hand-computed hash bits, resize-exactness,
  * planted-transform recall through the real JDK codec path (PNG + JPEG),
  * corrupt-byte survival, and the full dedup story.
  */
class ImageHashSpec extends SparkSpec {
  import java.awt.image.BufferedImage

  private def grayImage(w: Int, h: Int)(g: (Int, Int) => Int): BufferedImage = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = g(x, y)
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    im
  }

  test("aHash/dHash bits match hand computation on a half-split image") {
    // 8x8, left half gray 50, right half gray 200: one pixel per cell.
    val cells = ImageHash.cellLumas(grayImage(8, 8)((x, _) => if (x < 4) 50 else 200))
    assert(cells.toSeq == Seq.tabulate(64)(i => if (i % 8 < 4) 50000L else 200000L))
    // aHash: mean gates exactly the bright half -> per-row byte 0xF0
    assert(ImageHash.aHash64(cells) == 0xF0F0F0F0F0F0F0F0L)
    // cyclic dHash: only the x=3 -> x=4 step rises (the 7 -> 0 wrap falls)
    assert(ImageHash.dHash64(cells) == 0x0808080808080808L)
  }

  test("cell averaging is exact area-average (2x2 pixel blocks)") {
    // 16x16: each cell is a 2x2 block; make one block 3x gray 100 + 1x 200
    // -> integer mean milli-luma (3*100000 + 200000) / 4 = 125000
    val im = grayImage(16, 16)((x, y) => if (x == 0 && y == 0) 200 else 100)
    val cells = ImageHash.cellLumas(im)
    assert(cells(0) == 125000L)
    assert(cells(1) == 100000L)
  }

  test("synth hashes are resize-exact when 8 divides both dims") {
    for (seed <- 0L until 24L) {
      val a = ImageHash.cellLumas(ImageHash.synthImage(seed, 64, 48))
      val b = ImageHash.cellLumas(ImageHash.synthImage(seed, 96, 72))
      assert(ImageHash.dHash64(a) == ImageHash.dHash64(b), s"dHash seed $seed")
      assert(ImageHash.aHash64(a) == ImageHash.aHash64(b), s"aHash seed $seed")
    }
  }

  test("synth patch grids never tie on cyclic-adjacent cells") {
    for (seed <- 0L until 16L) {
      val lv = ImageHash.synthPatchLevels(seed)
      for (y <- 0 until 8; x <- 0 until 8) {
        assert(lv(y * 8 + x) != lv(y * 8 + (x + 1) % 8),
          s"seed $seed row $y horizontal tie at $x")
        if (y > 0) assert(lv(y * 8 + x) != lv((y - 1) * 8 + x),
          s"seed $seed vertical tie at ($x,$y)")
      }
    }
  }

  test("pHash is stable under resize+JPEG and separates distinct scenes") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val hashes = (0L until 16L).map { seed =>
      val base = ImageHash.pHash64(ImageHash.synthImage(seed, 64, 48))
      val resized = ImageHash.pHash64(ImageHash.synthImage(seed, 96, 72))
      val jpg = ImageHash.pHash64(
        ImageHash.decode(ImageHash.synthJpeg(seed, 64, 48)).get)
      assert(ham(base, resized) <= 3, s"seed $seed resize moved pHash too far")
      assert(ham(base, jpg) <= 3, s"seed $seed jpeg moved pHash too far")
      base
    }
    for (i <- hashes.indices; j <- 0 until i)
      assert(ham(hashes(i), hashes(j)) > 6,
        s"seeds $i/$j pHashes too close: ${ham(hashes(i), hashes(j))}")
  }

  test("planted PNG->JPEG+resize recall is 100% with zero false merges") {
    import spark.implicits._
    // the mm_neardup corpus shape: 160 base scenes, every 4th replanted as
    // a JPEG at 1.5x resolution under id+1000000
    val ids = (0L until 160L)
    val media = ids.flatMap { id =>
      val base = (id, ImageHash.synthPng(id, 64, 48))
      if (id % 4 == 0) Seq(base, (id + 1000000L, ImageHash.synthJpeg(id, 96, 72)))
      else Seq(base)
    }.toDF("media_id", "media")
    val hashed = ImageHash.imageHashes(media, "media_id", "media")
    val pairs = ImageHash.nearDupPairs(hashed, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = ids.filter(_ % 4 == 0).map(id => (id, id + 1000000L)).toSet
    assert((planted -- pairs).isEmpty, s"missed planted pairs: ${planted -- pairs}")
    assert((pairs -- planted).isEmpty, s"false merges: ${pairs -- planted}")

    val survivors = ImageHash.dropNearDuplicates(media, "media_id", "media", 3)
      .select("media_id").as[Long].collect().toSet
    assert(survivors == ids.toSet, "survivors must be exactly the base ids")
  }

  test("lumaFeatures are resize-exact embeddings that drive SemDeDup on images") {
    import spark.implicits._
    // 24 scenes; every 3rd replanted as a JPEG at 1.5× resolution
    val media = (0L until 24L).flatMap { id =>
      val base = (id, ImageHash.synthPng(id, 64, 48))
      if (id % 3 == 0) Seq(base, (id + 1000L, ImageHash.synthJpeg(id, 96, 72)))
      else Seq(base)
    }.toDF("media_id", "media")
    val emb = ImageHash.lumaFeatures(media, "media_id", "media")
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .localCheckpoint()
    // resize-exactness: base and rendition vectors are cosine ≈ 1
    val pairCos = emb.as("a").join(emb.as("b"),
        col("b.media_id") === col("a.media_id") + 1000L)
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .agg(min(col("c"))).head().getDouble(0)
    assert(pairCos >= 0.999, s"worst rendition cosine $pairCos")
    // distinct scenes stay well-separated
    val crossCos = emb.as("a").join(emb.as("b"),
        col("a.media_id") < col("b.media_id") &&
          col("b.media_id") =!= col("a.media_id") + 1000L &&
          col("a.media_id") < 1000L && col("b.media_id") < 1000L)
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .agg(max(col("c"))).head().getDouble(0)
    assert(crossCos < 0.999, s"distinct scenes too close: $crossCos")
    // the existing embedding SemDeDup drops the renditions, nothing else
    val kept = Similarity.semDedup(emb, threshold = 0.999, nClusters = 4,
        idCol = "media_id", vecCol = "embedding")
      .select("media_id").as[Long].collect().toSet
    assert(kept === (0L until 24L).toSet,
      s"SemDeDup over luma embeddings should keep exactly the bases: $kept")
  }

  test("undecodable bytes never pair and always survive") {
    import spark.implicits._
    val media = Seq(
      (1L, ImageHash.synthPng(7L, 64, 48)),
      (2L, ImageHash.synthPng(7L, 64, 48)),        // exact dup of 1
      (3L, Array[Byte](1, 2, 3, 4)),               // corrupt
      (4L, Array[Byte](1, 2, 3, 4))                // same corrupt bytes
    ).toDF("media_id", "media")
    val hashed = ImageHash.imageHashes(media, "media_id", "media")
    assert(hashed.filter(!col("decoded")).select("id").as[Long].collect().toSet
      == Set(3L, 4L))
    val pairs = ImageHash.nearDupPairs(hashed).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), "corrupt rows must not pair")
    val survivors = ImageHash.dropNearDuplicates(media, "media_id", "media")
      .select("media_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L, 4L))
  }
}
