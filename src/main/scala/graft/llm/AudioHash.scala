package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One hashed audio row: 64-bit energy-envelope hash + decode provenance.
  * `decoded = false` rows carry a zero hash and never pair.
  */
case class AudioHashed(id: Long, decoded: Boolean, ehash: Long,
    sample_rate: Int, n_samples: Long, channels: Int)

/** Audio near-duplicate detection over opaque WAV binary columns — the
  * audio leg of the multimodal family ([[ImageHash]] is the image leg).
  *
  * Codec: a manual RIFF/WAVE PCM-16 parser (~40 lines, no library — the
  * WAV container is a public, trivially stable format: RIFF header, then
  * even-aligned chunks; `fmt ` gives rate/channels/bits, `data` the PCM
  * payload). Parsing by hand keeps decode fully deterministic and
  * dependency-free; compressed formats (MP3 etc.) have no JDK decoder and
  * surface as `decoded = false` rows, the same corrupt-input contract as
  * the image leg.
  *
  * Hash (energy-envelope difference hash — the dHash idea on the time
  * axis): mix to mono, split the clip into 65 DURATION-FRACTION windows
  * (window w covers samples [w·n/65, (w+1)·n/65)), compute integer mean-
  * square energy per window, and set bit i iff energy(i+1) > energy(i).
  * Invariances by construction:
  *   - volume: scaling every sample by c scales every window energy by
  *     ~c², preserving all 64 comparisons;
  *   - sample rate: windows are fractions of the clip, not fixed sample
  *     counts, so a resampled rendition produces near-identical envelopes;
  *   - channel layout: the mono mix (l+r)/2 collapses duplicated-channel
  *     stereo to the identical signal.
  *
  * Scale mechanics: decode+hash is MAP-ONLY (audio bytes never shuffle —
  * only 16-byte (id, hash) rows move); candidate pairs ride the shared
  * [[Dedup.hamming64Pairs]] pigeonhole chunk blocking; survivors ride
  * [[Dedup.survivorAssignment]]. Identical 100 TB posture to the image leg.
  */
object AudioHash {

  /** Envelope windows: 65 windows → 64 gradient bits. */
  val Windows = 65

  /** Parsed PCM: rate, channel count, and the MONO-MIXED sample stream. */
  case class Wav(sampleRate: Int, channels: Int, monoSamples: Array[Int])

  /** Manual RIFF/WAVE PCM-16 parse; None on any structural violation. */
  def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    try {
      if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var rate = 0; var ch = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= bytes.length) {
        val id = tag(off); val sz = le32(off + 4)
        if (id == "fmt ") {
          if (le16(off + 8) != 1) return None // PCM only
          ch = le16(off + 10); rate = le32(off + 12); bits = le16(off + 22)
        } else if (id == "data") { dataOff = off + 8; dataLen = sz }
        off += 8 + sz + (sz & 1) // chunks are even-aligned
      }
      if (rate <= 0 || ch < 1 || ch > 2 || bits != 16 || dataOff < 0 ||
        dataOff + dataLen > bytes.length) return None
      val nFrames = dataLen / (2 * ch)
      if (nFrames <= 0) return None
      val mono = new Array[Int](nFrames)
      var f = 0
      while (f < nFrames) {
        val o = dataOff + f * 2 * ch
        val l = le16(o).toShort.toInt
        mono(f) = if (ch == 1) l else (l + le16(o + 2).toShort.toInt) / 2
        f += 1
      }
      Some(Wav(rate, ch, mono))
    } catch { case _: Exception => None }
  }

  /** Integer mean-square energy per duration-fraction window. */
  def energyEnvelope(samples: Array[Int]): Array[Long] = {
    val n = samples.length
    val out = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      val lo = (w.toLong * n / Windows).toInt
      val hi = math.max(lo + 1, ((w + 1).toLong * n / Windows).toInt)
      var s = 0L
      var i = math.min(lo, n - 1)
      val end = math.min(hi, n)
      while (i < end) { val v = samples(i).toLong; s += v * v; i += 1 }
      out(w) = s / math.max(end - math.min(lo, n - 1), 1)
      w += 1
    }
    out
  }

  /** Bit i ⇔ env(i+1) > env(i) (strict — deterministic tie-break). */
  def eHash64(env: Array[Long]): Long = {
    var bits = 0L
    var i = 0
    while (i < Windows - 1) {
      if (env(i + 1) > env(i)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Hash a binary WAV column. Map-only; bytes never shuffle. */
  def audioHashes(df: DataFrame, idCol: String, binCol: String): Dataset[AudioHashed] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(if (bytes == null) Array.emptyByteArray else bytes) match {
          case Some(w) =>
            AudioHashed(id, decoded = true, eHash64(energyEnvelope(w.monoSamples)),
              w.sampleRate, w.monoSamples.length.toLong, w.channels)
          case None => AudioHashed(id, decoded = false, 0L, 0, 0L, 0)
        }
      })
  }

  /** Near-dup pairs among decoded clips: hamming(ehash) ≤ maxHamming. */
  def nearDupPairs(hashed: Dataset[AudioHashed], maxHamming: Int = 3): DataFrame =
    Dedup.hamming64Pairs(
      hashed.toDF().filter(col("decoded"))
        .select(col("id"), col("ehash").as("fp")),
      maxHamming)

  /** Full audio-dedup story: hash → pairs → components → min-id survivor.
    * Undecodable rows always survive.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 3): DataFrame = {
    val hashed = audioHashes(df, idCol, binCol)
    val pairs = nearDupPairs(hashed, maxHamming)
    Dedup.applySurvivors(df, idCol, Dedup.survivorAssignment(pairs))
  }

  // ---------------------------------------------------------------------
  // Deterministic synthetic clips (validation / recall harness): a 440 Hz
  // tone whose amplitude steps through 65 seed-derived levels with no
  // adjacent ties — every envelope comparison sees a level-squared gap,
  // so the hash survives resampling and volume scaling by construction.
  // ---------------------------------------------------------------------

  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 65 amplitude levels in {1..8}·1024, no adjacent equal levels. */
  def synthLevels(seed: Long): Array[Int] = {
    val lv = new Array[Int](Windows)
    var s = splitmix(seed)
    var i = 0
    while (i < Windows) {
      s = splitmix(s)
      val banned = if (i > 0) lv(i - 1) / 1024 - 1 else -1
      val allowed = (0 until 8).filterNot(_ == banned)
      lv(i) = (allowed(((s % allowed.size) + allowed.size).toInt % allowed.size) + 1) * 1024
      i += 1
    }
    lv
  }

  /** Render the seed's level ladder as a PCM-16 WAV: 0.65 s of 440 Hz tone,
    * amplitude per duration-fraction window, `volumeMilli`/1000 gain,
    * duplicated across `channels`. Phase is a function of TIME (i/rate),
    * so renditions at different rates are the same waveform resampled.
    */
  def synthWav(seed: Long, sampleRate: Int, channels: Int = 1,
      volumeMilli: Int = 1000): Array[Byte] = {
    require(channels == 1 || channels == 2, "PCM-16 mono or stereo only")
    val lv = synthLevels(seed)
    val n = (sampleRate * 65L / 100L).toInt // 0.65 s → 0.01 s per window
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val w = math.min((i.toLong * Windows / n).toInt, Windows - 1)
      val a = lv(w).toLong * volumeMilli / 1000L
      val v = a * StrictMath.sin(2.0 * StrictMath.PI * 440.0 * i / sampleRate)
      samples(i) = math.max(Short.MinValue.toInt,
        math.min(Short.MaxValue.toInt, StrictMath.round(v).toInt)).toShort
      i += 1
    }
    val dataLen = n * 2 * channels
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * 2 * channels).putShort((2 * channels).toShort)
      .putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    i = 0
    while (i < n) {
      var c = 0
      while (c < channels) { out.putShort(samples(i)); c += 1 }
      i += 1
    }
    out.array()
  }
}
