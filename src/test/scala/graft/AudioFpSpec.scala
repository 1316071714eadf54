package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.plans.{AudioFp, AudioFpKernel}
import graft.tools.GenAudioFpFixtures

class AudioFpSpec extends SparkSpec {

  private def fp(bytes: Array[Byte], rate: Int = 6000): Option[(Long, Long)] =
    Option(AudioFpKernel.computeRow(bytes, rate)).map(r => (r.getLong(0), r.getLong(1)))

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  private lazy val fx = GenAudioFpFixtures.fixtures().toMap

  test("fingerprint is invariant to rate, channel layout, and gain") {
    val base = fp(fx("fp_tone_a_44k")).get
    // the same recording sampled at half the rate
    assert(fp(fx("fp_tone_a_22k")).get == base)
    // stereo remaster: every window energy doubles, order survives
    assert(fp(fx("fp_tone_a_stereo")).get == base)
    // gain 0.6: energies scale, order survives
    assert(fp(fx("fp_tone_a_gain")).get == base)
    assert(base._1 >= 0 && base._1 < (1L << 32) && base._2 >= 0 && base._2 < (1L << 32))
  }

  test("a one-window dropout at a local envelope max flips exactly 2 bits") {
    val d = hamming(fp(fx("fp_tone_a_44k")).get, fp(fx("fp_tone_a_drop")).get)
    assert(d == 2, s"dropout hamming $d != 2")
    // distinct tones are far
    val a = fp(fx("fp_tone_a_44k")).get
    for (other <- Seq("fp_tone_b_44k", "fp_tone_c_32k"))
      assert(hamming(a, fp(fx(other)).get) > 3, other)
  }

  test("non-PCM16 payloads fingerprint to null (quarantine, never throw)") {
    assert(fp(fx("fp_wav_8bit")).isEmpty)
    assert(fp(fx("fp_not_wav")).isEmpty)
    assert(fp(Array.emptyByteArray).isEmpty)
    // a valid WAV whose resample is EMPTY quarantines too: 1 frame at
    // 44.1 kHz → outFrames = 1*6000/44100 = 0 → null (the outFrames <= 0
    // branch of AudioFpKernel.computeRow)
    val one = java.nio.ByteBuffer.allocate(46)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    one.put("RIFF".getBytes("US-ASCII")).putInt(38)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(44100)
      .putInt(44100 * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2).putShort(1234)
    assert(fp(one.array(), rate = 6000).isEmpty)
    // while a normal half-second clip at the same rates is NOT quarantined
    val normal = GenAudioFpFixtures.toneWav(44100, seed = 5)
    assert(fp(normal, rate = 6000).isDefined)
  }

  test("banded pairs equal the brute-force scan over the fixture set") {
    import spark.implicits._
    val sig = fx.toSeq.map { case (n, bytes) =>
      val f = fp(bytes)
      (n, f.map(_._1), f.map(_._2))
    }.toDF("name", "hi", "lo")
    val got = Dedup.hammingPairs64(sig, "name", "hi", "lo", bands = 4, radius = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val sigs = fx.toSeq.flatMap { case (n, b) => fp(b).map(n -> _) }
    val expect = (for {
      (na, da) <- sigs; (nb, db) <- sigs if na < nb
      d = hamming(da, db) if d <= 3
    } yield (na, nb, d)).toSet
    assert(got == expect)
    // the whole planted re-encode family pairs up: C(5,2) = 10
    assert(expect.size == 10, s"expected the 10 planted pairs, got $expect")
  }

  test("incremental batch-vs-corpus admit: re-encodes rediscover originals, novel tones stay absent") {
    import spark.implicits._
    val sig = fx.toSeq.map { case (n, bytes) =>
      val f = fp(bytes)
      (n, f.map(_._1), f.map(_._2))
    }.toDF("name", "hi", "lo")
    val re = "_(22k|stereo|gain|drop)$"
    val got = Dedup.hammingPairs64Batch(
        sig.filter(!col("name").rlike(re)), sig.filter(col("name").rlike(re)),
        "name", "hi", "lo", bands = 4, radius = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // every planted re-encode finds exactly its corpus original (the
    // distinct tones b/c are all > radius away, spec above)
    assert(got == Set(
      ("fp_tone_a_22k", "fp_tone_a_44k"), ("fp_tone_a_stereo", "fp_tone_a_44k"),
      ("fp_tone_a_gain", "fp_tone_a_44k"), ("fp_tone_a_drop", "fp_tone_a_44k")))
    // a genuinely novel recording produces NO row — the admit signal
    val novel = Seq(("novel_tone", Some(0x5a5a5a5aL), Some(0x0f0f0f0fL)))
      .toDF("name", "hi", "lo")
    assert(Dedup.hammingPairs64Batch(sig, novel,
      "name", "hi", "lo", bands = 4, radius = 3).count() == 0)
  }

  test("AudioFp Expression agrees with the kernel through the column path") {
    import spark.implicits._
    val df = fx.toSeq.map { case (n, b) => (n, b) }.toDF("name", "payload")
    val rows = df.select(col("name"), AudioFp(col("payload"), 6000).as("fp"))
      .select(col("name"), col("fp.hi"), col("fp.lo"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    for ((n, b) <- fx) assert(rows(n) == fp(b), n)
  }
}
