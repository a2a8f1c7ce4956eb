package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One hashed media row: 64-bit perceptual hashes + decode provenance.
  * `decoded = false` rows carry zero hashes and are excluded from pairing
  * (a corrupt blob must not collide with every other corrupt blob).
  */
case class ImageHashed(id: Long, decoded: Boolean, ahash: Long, dhash: Long,
    phash: Long, img_w: Int, img_h: Int)

/** Perceptual-hash image near-duplicate detection — the REAL codec path of
  * the multimodal family ([[Multimodal]] keeps the stubbed feature kernel
  * for formats the JDK cannot read).
  *
  * Reference scope: the reference framework (ytitov/etl-tools-rs) moves
  * opaque bytes and has no media operators at all; this is part of the
  * beyond-reference curation surface (SURVEY.md §2 "multimodal columns").
  *
  * Design (public technique: average/difference hashing, Krawetz 2011-2013,
  * "Looks Like It" / "Kind of Like That"):
  *   - decode via `javax.imageio` (PNG/JPEG/BMP/GIF ship in the JDK — no
  *     external dependency), per-partition inside `mapPartitions` with the
  *     disk cache disabled, so executors never touch temp files;
  *   - downsample to a fixed 8×8 grid by EXACT integer area-averaging:
  *     cell (x,y) covers pixel block [x·w/8,(x+1)·w/8)×[y·h/8,(y+1)·h/8),
  *     accumulating integer milli-luma (299·R+587·G+114·B per pixel) into a
  *     Long and dividing once — no floats anywhere, so a given pixel grid
  *     always produces the identical hash on any JVM/partitioning;
  *   - aHash: bit i set iff 64·cell_i > Σcells (strict — deterministic
  *     tie-break);
  *   - dHash: CYCLIC row-gradient variant — bit (8y+x) set iff
  *     cell(y, (x+1) mod 8) > cell(y, x). 64 bits from the same 8×8 grid
  *     rather than the classic 9×8: the 9-column layout's remainder cells
  *     sit on fractional patch boundaries and wobble under resize, while
  *     the aligned 8-grid is resize-exact whenever 8 | w and 8 | h. Same
  *     gradient-sign principle, strictly better stability.
  *
  * Scale mechanics: decode+hash is MAP-ONLY (one pass over the binary
  * column, nothing shuffles but (id, long, long) rows); candidate pairs use
  * the same 4×16-bit pigeonhole chunk blocking as
  * [[Dedup.simhashNearDups]] (any pair within hamming ≤ 3 shares an exact
  * 16-bit chunk — no O(n²) stage); survivor resolution is the shared
  * [[Dedup.survivorAssignment]] star-contraction machinery. At 100 TB the
  * image BYTES never move after the scan: only 16-byte hash rows shuffle.
  */
object ImageHash {

  /** Grid side: 8×8 cells → 64-bit hashes. */
  val Grid = 8

  /** pHash working grid: 32×32 luma, DCT'd, top-left 8×8 kept. */
  val PGrid = 32

  /** Decode bytes to an image, None on any codec failure (corrupt bytes,
    * unknown format, zero-dimension payload). ImageIO's file-backed cache
    * is disabled process-wide on first use — executor-local, stateless.
    */
  def decode(bytes: Array[Byte]): Option[BufferedImage] = {
    ImageIO.setUseCache(false)
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      .filter(im => im.getWidth > 0 && im.getHeight > 0)
    catch { case _: Exception => None }
  }

  /** Exact integer area-average milli-luma per grid cell, row-major.
    * Images narrower/shorter than the grid fall back to nearest-neighbor
    * sampling for the empty block (lo == hi ⇒ take pixel lo, clamped).
    */
  def cellLumas(img: BufferedImage): Array[Long] = cellLumas(img, Grid)

  def cellLumas(img: BufferedImage, grid: Int): Array[Long] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Long](grid * grid)
    var cy = 0
    while (cy < grid) {
      val y0 = cy * h / grid
      val y1 = math.max(y0 + 1, (cy + 1) * h / grid)
      var cx = 0
      while (cx < grid) {
        val x0 = cx * w / grid
        val x1 = math.max(x0 + 1, (cx + 1) * w / grid)
        var sum = 0L
        var y = math.min(y0, h - 1)
        val yEnd = math.min(y1, h)
        val xStart = math.min(x0, w - 1)
        val xEnd = math.min(x1, w)
        while (y < yEnd) {
          var x = xStart
          while (x < xEnd) {
            val rgb = img.getRGB(x, y)
            sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val n = (yEnd - math.min(y0, h - 1)).toLong * (xEnd - xStart)
        out(cy * grid + cx) = sum / math.max(n, 1L)
        cx += 1
      }
      cy += 1
    }
    out
  }

  // DCT-II basis for the 32-point transform, built with StrictMath (bit-
  // identical on every JVM/platform — Math.cos is only 1-ulp-accurate and
  // may differ across architectures, which would make pHash partition-
  // dependent on a heterogeneous cluster).
  private lazy val DctBasis: Array[Array[Double]] = {
    val b = Array.ofDim[Double](PGrid, PGrid)
    var u = 0
    while (u < PGrid) {
      var x = 0
      while (x < PGrid) {
        b(u)(x) = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * PGrid))
        x += 1
      }
      u += 1
    }
    b
  }

  /** DCT perceptual hash (the "pHash" of the aHash/dHash/pHash family):
    * 32×32 integer luma grid → 2-D DCT-II (fixed left-to-right
    * accumulation, StrictMath basis — fully deterministic doubles) → the
    * 63 AC coefficients of the top-left 8×8 block, thresholded against
    * their median (strict >; the DC coefficient is excluded so global
    * brightness shifts don't move bits). Bit i corresponds to zigzag-free
    * row-major coefficient order with DC's bit pinned to 0. More robust
    * than aHash/dHash to smooth local edits because low-frequency DCT
    * coefficients integrate over the whole frame.
    */
  def pHash64(img: BufferedImage): Long = {
    val cells = cellLumas(img, PGrid)
    // rows then columns: separable 2-D DCT with a fixed accumulation order
    val rows = Array.ofDim[Double](PGrid, PGrid)
    var y = 0
    while (y < PGrid) {
      var u = 0
      while (u < PGrid) {
        var s = 0.0
        var x = 0
        while (x < PGrid) { s += DctBasis(u)(x) * cells(y * PGrid + x); x += 1 }
        rows(y)(u) = s
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < Grid) {
      var u = 0
      while (u < Grid) {
        var s = 0.0
        var yy = 0
        while (yy < PGrid) { s += DctBasis(v)(yy) * rows(yy)(u); yy += 1 }
        coef(v * Grid + u) = s
        u += 1
      }
      v += 1
    }
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    val sorted = ac.clone(); java.util.Arrays.sort(sorted)
    val median = sorted(31)
    var bits = 0L
    var i = 1
    while (i < 64) {
      if (coef(i) > median) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Average hash: bit i ⇔ 64·cell_i > Σcells (strict). */
  def aHash64(cells: Array[Long]): Long = {
    var total = 0L
    var i = 0
    while (i < cells.length) { total += cells(i); i += 1 }
    var bits = 0L
    i = 0
    while (i < cells.length) {
      if (cells(i) * 64 > total) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Cyclic difference hash: bit (8y+x) ⇔ cell(y,(x+1) mod 8) > cell(y,x). */
  def dHash64(cells: Array[Long]): Long = {
    var bits = 0L
    var y = 0
    while (y < Grid) {
      var x = 0
      while (x < Grid) {
        if (cells(y * Grid + ((x + 1) % Grid)) > cells(y * Grid + x))
          bits |= (1L << (y * Grid + x))
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Hash a binary image column: (id, decoded, ahash, dhash, img_w, img_h).
    * Map-only; the bytes are read once and never shuffled.
    */
  def imageHashes(df: DataFrame, idCol: String, binCol: String): Dataset[ImageHashed] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decode(if (bytes == null) Array.emptyByteArray else bytes) match {
          case Some(im) =>
            val cells = cellLumas(im)
            ImageHashed(id, decoded = true, aHash64(cells), dHash64(cells),
              pHash64(im), im.getWidth, im.getHeight)
          case None => ImageHashed(id, decoded = false, 0L, 0L, 0L, 0, 0)
        }
      })
  }

  /** REAL image embeddings (not [[Multimodal.decodeStub]]): the 8×8
    * integer area-average luma grid as a 64-dim `array<float>` vector —
    * exactly the aHash cells, so resize-EXACT whenever 8 | dims and
    * JPEG-stable within cell-average noise. This plugs image columns into
    * every embedding operator ([[Similarity.semDedup]], brute/IVF/PQ ANN,
    * k-means, hard negatives) with no new machinery: an image corpus
    * becomes an embeddings corpus in one map-only pass. Undecodable rows
    * are dropped (they carry no geometry; the dedup paths keep them via
    * the decoded flag instead).
    *
    * Output: (idCol, `featCol` array<float>) matching the embeddings
    * table shape.
    */
  def lumaFeatures(df: DataFrame, idCol: String, binCol: String,
      featCol: String = "embedding"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decode(if (bytes == null) Array.emptyByteArray else bytes).map { im =>
          (id, cellLumas(im).map(_.toFloat / 1000f))
        }
      })
      .toDF(idCol, featCol)
  }

  /** Near-dup pairs among DECODED images: hamming(`hashCol`) ≤ maxHamming,
    * id_a < id_b, via [[Dedup.hamming64Pairs]] chunk blocking (sound only
    * for maxHamming ≤ 3 — enforced there).
    * Output: (id_a, id_b, hamming).
    */
  def nearDupPairs(hashed: Dataset[ImageHashed], maxHamming: Int = 3,
      hashCol: String = "dhash"): DataFrame =
    Dedup.hamming64Pairs(
      hashed.toDF().filter(col("decoded"))
        .select(col("id"), col(hashCol).as("fp")),
      maxHamming)

  /** The full image-dedup story: hash → pairs → connected components →
    * min-id survivor per component. Undecodable rows always survive (they
    * never pair). Returns `df` minus non-survivor rows.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 3, hashCol: String = "dhash"): DataFrame = {
    val hashed = imageHashes(df, idCol, binCol).toDF().localCheckpoint()
    val pairs = nearDupPairs(hashed.as[ImageHashed](
      org.apache.spark.sql.Encoders.product[ImageHashed]), maxHamming, hashCol)
    val assignment = Dedup.survivorAssignment(pairs)
    Dedup.applySurvivors(df, idCol, assignment)
  }

  // ---------------------------------------------------------------------
  // Deterministic synthetic image corpus (validation / recall harness).
  // The planted-transform pattern of the ANN recall suite, in image form:
  // render a seed-derived scene at several resolutions/codecs and assert
  // the hashes agree.
  // ---------------------------------------------------------------------

  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Seed-derived 8×8 luma-level patch grid with NO equal cyclic-adjacent
    * patches (left neighbor, top neighbor, and the row wrap 7→0): every
    * dHash comparison sees a level gap ≥ 25 luma, so the hash survives
    * resize (exact, when 8 | dims) and JPEG re-encode (cell-average noise
    * ≪ the gap). Levels are 8 steps over [20, 215].
    */
  def synthPatchLevels(seed: Long): Array[Int] = {
    val lv = new Array[Int](Grid * Grid)
    var y = 0
    var s = splitmix(seed)
    while (y < Grid) {
      var x = 0
      while (x < Grid) {
        s = splitmix(s)
        val banned = scala.collection.mutable.Set.empty[Int]
        if (x > 0) banned += lv(y * Grid + x - 1)
        if (y > 0) banned += lv((y - 1) * Grid + x)
        if (x == Grid - 1) banned += lv(y * Grid) // row wrap for cyclic dHash
        val allowed = (0 until 8).filterNot(l => banned.contains(l * 28 + 20))
        lv(y * Grid + x) = allowed(((s % allowed.size) + allowed.size).toInt % allowed.size) * 28 + 20
        x += 1
      }
      y += 1
    }
    lv
  }

  /** Render the seed's patch grid at (w, h). Resize-exact for the hash when
    * 8 divides both dims (cell boundaries align with patch boundaries).
    */
  def synthImage(seed: Long, w: Int, h: Int): BufferedImage = {
    val lv = synthPatchLevels(seed)
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = lv((math.min(y * Grid / h, Grid - 1)) * Grid +
          math.min(x * Grid / w, Grid - 1))
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    im
  }

  /** Encode with a JDK writer; format ∈ {"png", "jpg", "bmp"}. */
  def encode(im: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(im, format, out), s"no JDK writer for $format")
    out.toByteArray
  }

  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] =
    encode(synthImage(seed, w, h), "png")

  def synthJpeg(seed: Long, w: Int, h: Int): Array[Byte] =
    encode(synthImage(seed, w, h), "jpg")
}
