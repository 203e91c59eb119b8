package graft.ops

import org.apache.spark.sql.DataFrame

/** Energy-based voice-activity segmentation — the first pass of every
  * speech-data pipeline (cut silence, keep utterances) next to the
  * fingerprint dedup ([[AudioFp]]) and decode-feature ([[Multimodal]])
  * surfaces. Frames of `frameLen` samples score sum-of-squares
  * energy; frames above `energyThreshold` are voiced; consecutive
  * voiced frames merge into segments (classic gaps-and-islands, done
  * in the same per-document scan — no window function, no second
  * pass).
  *
  * Scale posture: pure per-row expansion over the media column — each
  * task decodes its own payloads and emits that document's segments;
  * ZERO shuffles, embarrassingly parallel at any corpus size. Energy
  * sums are exact Longs (int16 PCM squares), so the m66 oracle
  * replays segmentation bit-for-bit.
  *
  * Output: (doc_id, seg_id, start_frame, end_frame, n_frames,
  * energy_sum) — seg_id numbers a document's segments from 0 in time
  * order; a document with no voiced frame emits nothing.
  */
object AudioVad {

  final case class VadSegment(doc_id: Long, seg_id: Int, start_frame: Int,
      end_frame: Int, n_frames: Int, energy_sum: Long)

  final case class ZcrFrame(doc_id: Long, frame: Int, energy: Long,
      zcr: Int, voiced: Boolean)

  /** Per-frame zero-crossing rate next to frame energy — the classic
    * voiced/unvoiced discriminator (voiced speech: high energy, low
    * ZCR; fricatives/noise: high ZCR). A crossing is a strict sign
    * change between CONSECUTIVE samples inside the frame
    * (v(i−1)·v(i) < 0) — exact integer arithmetic, no boundary pair
    * spans two frames. Same zero-shuffle per-document scan shape as
    * [[vadSegments]].
    */
  def zcrFrames(media: DataFrame, frameLen: Int = 10,
      energyThreshold: Long = 1000000L): DataFrame = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val s = Multimodal.decodeAudio(payload).samples
        val nFrames = s.length / frameLen
        (0 until nFrames).map { f =>
          var e = 0L
          var z = 0
          var i = f * frameLen
          val end = i + frameLen
          while (i < end) {
            e += s(i).toLong * s(i)
            if (i > f * frameLen && s(i - 1).toInt * s(i) < 0) z += 1
            i += 1
          }
          ZcrFrame(id, f, e, z, e > energyThreshold)
        }
      }.toDF()
  }

  def vadSegments(media: DataFrame, frameLen: Int = 10,
      energyThreshold: Long = 1000000L): DataFrame = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val audio = Multimodal.decodeAudio(payload)
        val s = audio.samples
        val nFrames = s.length / frameLen // trailing partial frame drops
        val out = scala.collection.mutable.ArrayBuffer.empty[VadSegment]
        var seg = -1
        var segStart = -1
        var segEnergy = 0L
        var f = 0
        while (f < nFrames) {
          var e = 0L
          var i = f * frameLen
          val end = i + frameLen
          while (i < end) { e += s(i).toLong * s(i); i += 1 }
          if (e > energyThreshold) {
            if (segStart < 0) { seg += 1; segStart = f; segEnergy = 0L }
            segEnergy += e
          } else if (segStart >= 0) {
            out += VadSegment(id, seg, segStart, f - 1, f - segStart, segEnergy)
            segStart = -1
          }
          f += 1
        }
        if (segStart >= 0)
          out += VadSegment(id, seg, segStart, nFrames - 1, nFrames - segStart, segEnergy)
        out
      }.toDF()
  }
}
