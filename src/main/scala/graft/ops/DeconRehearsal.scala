package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decontamination-at-scale rehearsal: the benchmark screen a 100 TB
  * corpus build runs before training — bag-of-grams overlap via the
  * AUTO-selected plan ([[TextDedup.benchmarkOverlapAuto]]) plus the
  * longest-overlap-run metric ([[TextDedup.overlapRun]]) — driven
  * end-to-end over a distributed synthetic corpus with PLANTED
  * benchmark quotes, and checked against the plant exactly.
  *
  * The corpus/benchmark ratio (200k vs 1k) sits squarely in the
  * bloom regime (ratio ≥ 8, corpus ≥ 100k), so the run asserts the
  * bloom semi-join plan actually ARMED — the at-scale proof of the
  * d54/d57 crossover policy that sf-sized gates cannot give — and
  * that its verdicts are bit-identical to the plant: every quoting
  * doc dropped with exactly the planted gram count and run length,
  * every clean doc kept.
  *
  * Lives in main (not test) so [[graft.Bench]] reports its wall time
  * per round (`t_decon200k`); `DedupScaleSpec` runs the same cascade
  * at a spec-sized corpus.
  *
  * Generation is one `spark.range` map — no driver-side corpus. Docs
  * are 50 words of per-doc-disjoint 't'-streams; benchmark docs use
  * 'q'-streams (prefix-disjoint from every corpus doc). Every doc
  * with id % 100 == 7 embeds words 0..11 of benchmark doc (id mod b)
  * at position 20: a 12-token quote → exactly 5 overlapping 8-grams
  * and one run of 5 (boundary grams mix prefixes, so they can never
  * match).
  */
object DeconRehearsal {

  def synthCorpus(spark: SparkSession, n: Long, b: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      expr(s"""array_join(transform(sequence(0, 49), j ->
          CASE WHEN id % 100 = 7 AND j >= 20 AND j < 32
               THEN concat('q', (id % ${b}L) * 53L + (j - 20) * 17L)
               ELSE concat('t', id * 53L + j * 17L) END), ' ')""").as("text"))

  def synthBench(spark: SparkSession, b: Long): DataFrame =
    spark.range(b).select((col("id") + 1000000000L).as("doc_id"),
      expr("""array_join(transform(sequence(0, 49), j ->
          concat('q', id * 53L + j * 17L)), ' ')""").as("text"))

  /** Run both screens; returns wall seconds. Throws if the bloom plan
    * fails to arm at this ratio or any verdict diverges from the
    * plant (both screens are exact given their gram sets, so the
    * check is equality, not a recall floor).
    */
  def run(spark: SparkSession, n: Long = 200000L, b: Long = 1000L): Double = {
    require(n % 100 == 0 && b > 0, s"n=$n must be a multiple of 100, b=$b > 0")
    val t0 = System.nanoTime()
    val corpus = synthCorpus(spark, n, b)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = synthBench(spark, b)
    val planted = n / 100

    val (screen, bloomArmed) = TextDedup.benchmarkOverlapAuto(
      corpus, bench, n = 8, maxFrac = 0.05)
    // the plan decision must TRACK the corpus shape (pinned from both
    // sides, like the dedup rehearsal's salting decision): the 200k/1k
    // run arms the bloom, the spec-sized run keeps the exact plan
    require(bloomArmed == (n >= 100000L && n >= 8L * b),
      s"bloom armed=$bloomArmed at corpus=$n benchmark=$b")
    val droppedDf = screen.filter(!col("keep"))
      .select(col("doc_id"), col("n_contaminated"))
    val nDropped = droppedDf.count()
    require(nDropped == planted,
      s"screen dropped $nDropped docs, planted $planted")
    // driver traffic bounded: exactly `planted` (n/100) rows, just verified
    val dropped = droppedDf.collect()
    dropped.foreach { r =>
      require(r.getLong(0) % 100 == 7, s"false drop: doc ${r.getLong(0)}")
      require(r.getLong(1) == 5L,
        s"doc ${r.getLong(0)}: ${r.getLong(1)} contaminated grams, planted 5")
    }

    val runs = TextDedup.overlapRun(corpus, bench, n = 8, flagTokens = 12)
    val flaggedDf = runs.filter(col("flagged"))
      .select(col("doc_id"), col("max_run"), col("max_overlap_tokens"))
    val nFlagged = flaggedDf.count()
    require(nFlagged == planted,
      s"overlap-run flagged $nFlagged docs, planted $planted")
    // driver traffic bounded: exactly `planted` rows, just verified
    val flagged = flaggedDf.collect()
    flagged.foreach { r =>
      require(r.getLong(0) % 100 == 7 && r.getLong(1) == 5L && r.getLong(2) == 12L,
        s"doc ${r.getLong(0)}: run ${r.getLong(1)} span ${r.getLong(2)}, planted 5/12")
    }
    corpus.unpersist()
    (System.nanoTime() - t0) / 1e9
  }
}
