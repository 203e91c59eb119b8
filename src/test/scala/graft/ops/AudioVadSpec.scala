package graft.ops

import graft.SparkSpec

/** VAD segmentation (AudioVad.scala) — the traps: run merging,
  * trailing-voiced flush, all-silence docs, partial-frame drop,
  * exact energy sums.
  */
class AudioVadSpec extends SparkSpec {

  import spark.implicits._

  /** PCM-16 WAV with the given samples. */
  private def wav(samples: Seq[Short]): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("runs merge, trailing voiced flushes, silence emits nothing") {
    val loud = Seq.fill(3)(1000.toShort)   // frame energy 3e6 > threshold
    val quiet = Seq.fill(3)(10.toShort)    // 300
    // doc 1: [loud, loud, quiet, loud] -> segments (0-1) and (3)
    // doc 2: all quiet -> no rows
    // doc 3: 2 trailing samples beyond the last full frame drop
    val docs = Seq(
      (1L, wav(loud ++ loud ++ quiet ++ loud)),
      (2L, wav(quiet ++ quiet)),
      (3L, wav(loud ++ quiet ++ loud.take(2)))).toDF("doc_id", "media")
    val out = AudioVad.vadSegments(docs, frameLen = 3, energyThreshold = 1000L)
      .orderBy("doc_id", "seg_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 0, 0, 1, 2, 6000000L),
      (1L, 1, 3, 3, 1, 3000000L),
      (3L, 0, 0, 0, 1, 3000000L)))
    intercept[IllegalArgumentException](AudioVad.vadSegments(docs, frameLen = 0))
  }

  test("vadChunks: span cap includes gaps, no mid-segment split, " +
      "oversized segment keeps its own chunk") {
    val loud = Seq.fill(3)(1000.toShort)
    val quiet = Seq.fill(3)(10.toShort)
    // frames: V V q V q q V V V V  (V = voiced)
    // segments: [0,1] [3,3] [6,9]
    // maxFrames=4: chunk0 = [0,3] (span 4, includes the gap at 2),
    // chunk1 = [6,9] (span-4 segment alone — [3..9] would span 7)
    val frames = Seq(loud, loud, quiet, loud, quiet, quiet,
      loud, loud, loud, loud).flatten
    val docs = Seq((5L, wav(frames))).toDF("doc_id", "media")
    val got = AudioVad.vadChunks(docs, frameLen = 3, energyThreshold = 1000L,
        maxFrames = 4)
      .orderBy("chunk_id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0, 0, 3, 2, 9000000L),
      (1, 6, 9, 1, 12000000L)))
    intercept[IllegalArgumentException](
      AudioVad.vadChunks(docs, maxFrames = 0))
  }

  test("zcrFrames: strict sign changes inside the frame only") {
    // frame 0: +5 -5 +5 -5 → 3 crossings, energy 100
    // frame 1: +5 +5 0 -5  → 0 crossings (0 kills both products)
    // frame 2: -9 +9 -9 +9 → 3 crossings; boundary pair (-5, -9) is
    //          NOT counted (different frames)
    val samples = Seq[Short](5, -5, 5, -5, 5, 5, 0, -5, -9, 9, -9, 9)
    val docs = Seq((7L, wav(samples))).toDF("doc_id", "media")
    val got = AudioVad.zcrFrames(docs, frameLen = 4, energyThreshold = 200L)
      .orderBy("frame").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getInt(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (0, 100L, 3, false),
      (1, 75L, 0, false),
      (2, 324L, 3, true)))
  }
}
