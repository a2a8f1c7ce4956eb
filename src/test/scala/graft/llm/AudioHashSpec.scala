package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Audio energy-envelope dedup: WAV parse round-trip, hand-computed hash
  * bits, rate/volume/channel invariance, planted-transform recall, corrupt
  * survival.
  */
class AudioHashSpec extends SparkSpec {

  test("RIFF/WAVE parse round-trips the synthesizer's parameters") {
    val w = AudioHash.decodeWav(AudioHash.synthWav(5L, 44100)).get
    assert(w.sampleRate == 44100 && w.channels == 1)
    assert(w.monoSamples.length == 44100 * 65 / 100)
    // duplicated-channel stereo mixes back to the identical mono stream
    val st = AudioHash.decodeWav(AudioHash.synthWav(5L, 44100, channels = 2)).get
    assert(st.channels == 2)
    assert(st.monoSamples.toSeq == w.monoSamples.toSeq)
  }

  test("eHash bits are the envelope gradient signs") {
    // one sample per window: envelope = value², so a ramp sets every bit
    val up = Array.tabulate(AudioHash.Windows)(i => i)
    assert(AudioHash.eHash64(AudioHash.energyEnvelope(up)) == -1L)
    val down = up.reverse
    assert(AudioHash.eHash64(AudioHash.energyEnvelope(down)) == 0L)
    val flat = Array.fill(AudioHash.Windows)(7)
    assert(AudioHash.eHash64(AudioHash.energyEnvelope(flat)) == 0L)
  }

  test("hash is invariant to resampling, volume, and channel duplication") {
    def h(b: Array[Byte]): Long =
      AudioHash.eHash64(AudioHash.energyEnvelope(
        AudioHash.decodeWav(b).get.monoSamples))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    for (seed <- 0L until 16L) {
      val base = h(AudioHash.synthWav(seed, 44100))
      assert(ham(base, h(AudioHash.synthWav(seed, 22050))) <= 3,
        s"resample moved seed $seed too far")
      assert(ham(base, h(AudioHash.synthWav(seed, 44100, volumeMilli = 600))) <= 3,
        s"volume moved seed $seed too far")
      assert(ham(base, h(AudioHash.synthWav(seed, 44100, channels = 2))) == 0,
        s"stereo duplication moved seed $seed")
    }
  }

  test("planted resample+volume+stereo recall is 100% with zero false merges") {
    import spark.implicits._
    val ids = (0L until 120L)
    val clips = ids.flatMap { id =>
      val base = (id, AudioHash.synthWav(id, 44100))
      if (id % 4 == 0)
        Seq(base, (id + 1000000L,
          AudioHash.synthWav(id, 22050, channels = 2, volumeMilli = 600)))
      else Seq(base)
    }.toDF("media_id", "media")
    val hashed = AudioHash.audioHashes(clips, "media_id", "media")
    val pairs = AudioHash.nearDupPairs(hashed, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = ids.filter(_ % 4 == 0).map(id => (id, id + 1000000L)).toSet
    assert((planted -- pairs).isEmpty, s"missed planted pairs: ${planted -- pairs}")
    assert((pairs -- planted).isEmpty, s"false merges: ${pairs -- planted}")
    val survivors = AudioHash.dropNearDuplicates(clips, "media_id", "media", 3)
      .select("media_id").as[Long].collect().toSet
    assert(survivors == ids.toSet)
  }

  test("corrupt and truncated payloads never pair and always survive") {
    import spark.implicits._
    val good = AudioHash.synthWav(9L, 44100)
    val clips = Seq(
      (1L, good),
      (2L, good.clone()),
      (3L, Array[Byte](82, 73, 70, 70)),      // "RIFF" then nothing
      (4L, good.take(50))                      // truncated past the header
    ).toDF("media_id", "media")
    val hashed = AudioHash.audioHashes(clips, "media_id", "media")
    assert(hashed.filter(!col("decoded")).select("id").as[Long].collect().toSet
      == Set(3L, 4L))
    val survivors = AudioHash.dropNearDuplicates(clips, "media_id", "media")
      .select("media_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L, 4L))
  }
}
