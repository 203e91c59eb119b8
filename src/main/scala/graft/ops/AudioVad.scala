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

  private def segmentsOf(id: Long, s: Array[Short], frameLen: Int,
      energyThreshold: Long): scala.collection.mutable.ArrayBuffer[VadSegment] = {
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
  }

  def vadSegments(media: DataFrame, frameLen: Int = 10,
      energyThreshold: Long = 1000000L): DataFrame = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        segmentsOf(id, Multimodal.decodeAudio(payload).samples,
          frameLen, energyThreshold)
      }.toDF()
  }

  final case class VadChunk(doc_id: Long, chunk_id: Int, start_frame: Int,
      end_frame: Int, n_segments: Int, energy_sum: Long)

  /** Greedy packing of voiced segments into bounded decode windows —
    * the ASR batching step after VAD (decode windows must not exceed
    * the model's receptive field, must start/end on segment
    * boundaries, and should pack as many consecutive segments as
    * fit). A chunk's SPAN (first segment start → last segment end,
    * silence gaps included — the decoder sees the whole window)
    * stays ≤ `maxFrames`; a lone segment longer than `maxFrames`
    * becomes its own chunk, never split mid-utterance. Same
    * zero-shuffle per-document scan as [[vadSegments]]: segmentation
    * and packing happen in one pass over the decoded samples.
    */
  def vadChunks(media: DataFrame, frameLen: Int = 10,
      energyThreshold: Long = 1000000L, maxFrames: Int = 6): DataFrame = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val segs = segmentsOf(id, Multimodal.decodeAudio(payload).samples,
          frameLen, energyThreshold)
        val out = scala.collection.mutable.ArrayBuffer.empty[VadChunk]
        var cid = -1
        var cs = -1; var ce = -1; var n = 0; var e = 0L
        def flush(): Unit =
          if (cs >= 0) out += VadChunk(id, cid, cs, ce, n, e)
        segs.foreach { s =>
          if (cs >= 0 && s.end_frame - cs + 1 <= maxFrames) {
            ce = s.end_frame; n += 1; e += s.energy_sum
          } else {
            flush()
            cid += 1; cs = s.start_frame; ce = s.end_frame
            n = 1; e = s.energy_sum
          }
        }
        flush()
        out
      }.toDF()
  }
}
