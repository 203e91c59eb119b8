package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Audio perceptual fingerprint — the audio leg of the multimodal
  * dedup trifecta (text MinHash/SimHash, image dHash, this): a 64-bit
  * energy-difference hash over 65 time windows, robust to uniform
  * gain/offset-free edits and exact-integer computable, so near-dup
  * audio joins run through the SAME banded Hamming machinery as
  * images ([[ImageDedup.nearDupPairs]] takes any (doc_id, dhash)).
  *
  * bit(w) = [meanEnergy(w) < meanEnergy(w+1)] for the 64 adjacent
  * window pairs; energy = Σ s², an exact Long per window; means
  * compare via arbitrary-precision cross-multiplication (64 BigInt
  * ops per file — negligible), so no float ever enters the hash and
  * a SQL oracle replays every bit. Computed at decode time,
  * partition-local; 8 bytes per file move afterward.
  */
object AudioFp {

  val Windows = 65 // -> 64 adjacent comparisons = 64 bits

  /** Exact 64-bit energy-difference hash of PCM-16 samples. */
  def energyDiffHash(samples: Array[Short]): Long = {
    val n = samples.length
    require(n >= Windows, s"need >= $Windows samples for a fingerprint, got $n")
    val sums = new Array[Long](Windows)
    val counts = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      // Long arithmetic: w * n overflows Int past ~33.5M samples
      // (a ~13-minute 44.1 kHz file) — the boundaries must not wrap
      val i0 = (w.toLong * n / Windows).toInt
      val i1 = math.max(i0 + 1, ((w + 1).toLong * n / Windows).toInt)
      var s = 0L
      var i = i0
      while (i < i1) {
        val v = samples(i).toLong
        s += v * v
        i += 1
      }
      sums(w) = s; counts(w) = i1 - i0
      w += 1
    }
    var hash = 0L
    var b = 0
    while (b < Windows - 1) {
      // meanL < meanR  <=>  sumL*nR < sumR*nL, exact in BigInt
      if (BigInt(sums(b)) * counts(b + 1) < BigInt(sums(b + 1)) * counts(b))
        hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Distributed fingerprinting over (doc_id, media) WAV/FLAC blobs;
    * output column is named `dhash` so [[ImageDedup.nearDupPairs]]
    * consumes it directly.
    */
  def hashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        (id, energyDiffHash(Multimodal.decodeAudio(payload).samples))
      }).toDF("doc_id", "dhash")
  }
}
