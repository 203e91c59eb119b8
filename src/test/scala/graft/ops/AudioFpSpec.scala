package graft.ops

import graft.SparkSpec

class AudioFpSpec extends SparkSpec {

  /** Independent reference: window mean energies as exact rationals. */
  private def refHash(samples: Array[Short]): Long = {
    val n = samples.length
    def win(w: Int): (BigInt, BigInt) = {
      val i0 = w * n / 65
      val i1 = math.max(i0 + 1, (w + 1) * n / 65)
      val s = (i0 until i1).map(i => BigInt(samples(i).toLong) * samples(i)).sum
      (s, BigInt(i1 - i0))
    }
    var h = 0L
    for (b <- 0 until 64) {
      val (sl, nl) = win(b); val (sr, nr) = win(b + 1)
      if (sl * nr < sr * nl) h |= 1L << b
    }
    h
  }

  test("hash matches the exact-rational reference, divisible and ragged sizes") {
    for (n <- Seq(650, 137, 65, 1000)) {
      val s = Array.tabulate[Short](n)(i => (((i * 7919 + n * 13) % 65536) - 32768).toShort)
      assert(AudioFp.energyDiffHash(s) === refHash(s), s"n=$n")
    }
    intercept[IllegalArgumentException] {
      AudioFp.energyDiffHash(new Array[Short](64)) // below one sample/window
    }
  }

  test("window boundaries survive >2^31/65 samples (no Int overflow)") {
    // 34M samples: w*n would wrap negative in Int arithmetic
    val n = 34000000
    val s = new Array[Short](n)
    var i = 0
    while (i < n) { s(i) = ((i * 31) % 65536 - 32768).toShort; i += 1 }
    val h = AudioFp.energyDiffHash(s) // must not throw
    assert(h == AudioFp.energyDiffHash(s)) // and be stable
  }

  test("a one-window perturbation flips at most two bits") {
    val base = Array.tabulate[Short](650)(i => (((i * 7) % 65536) - 32768).toShort)
    val variant = base.clone()
    for (i <- 300 until 310) // exactly window 30
      variant(i) = (((i * 7 + 9999) % 65536) - 32768).toShort
    val d = java.lang.Long.bitCount(
      AudioFp.energyDiffHash(base) ^ AudioFp.energyDiffHash(variant))
    assert(d <= 2 && d >= 0)
  }

  test("fingerprint is container-invariant: FLAC of the same samples matches WAV") {
    import spark.implicits._
    // same PCM through the WAV fixture and the pure-JVM FLAC encoder
    val docs = (0L until 8L).toDF("doc_id")
    val wavFp = AudioFp.hashes(spark, Multimodal.syntheticWavPlanted(docs))
      .as[(Long, Long)].collect().toMap
    val flacMedia = Multimodal.syntheticWavPlanted(docs).as[(Long, Array[Byte])]
      .map { case (id, wav) =>
        val samples = Multimodal.decodeWav(wav).samples
        (id, Flac.encodeVerbatim(samples, 1, 8000))
      }.toDF("doc_id", "media")
    val flacFp = AudioFp.hashes(spark, flacMedia).as[(Long, Long)].collect().toMap
    assert(flacFp === wavFp)
  }

  test("end-to-end: WAV decode -> fingerprint -> banded pairs = brute force") {
    import spark.implicits._
    val docs = (0L until 80L).toDF("doc_id")
    val h = AudioFp.hashes(spark, Multimodal.syntheticWavPlanted(docs))
    val hs = h.as[(Long, Long)].collect().toMap
    assert(hs.size === 80)
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b)).toSet
    val got = ImageDedup.nearDupPairs(h, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === brute)
    // every planted (base, variant) pair is within radius
    for (v <- 3L until 80L by 4L) assert(brute.contains((v - 1, v)), s"pair ${v - 1},$v")
  }
}
