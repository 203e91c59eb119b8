package graft.ops

import graft.SparkSpec

/** Spec-sized run of the [[DedupRehearsal]] cascade: the plant is
  * recovered exactly (the require()s inside `run` are the
  * assertions — every planted pair found, zero false pairs, cluster
  * count = docs − pairs, one canonical per cluster).
  */
class DedupScaleSpec extends SparkSpec {

  test("planted near-dups are recovered exactly at 3k docs") {
    val secs = DedupRehearsal.run(spark, n = 3000L)
    assert(secs > 0.0)
  }

  test("synthetic corpus: distinct docs share no words, planted copies share 47") {
    import org.apache.spark.sql.functions._
    val docs = DedupRehearsal.synth(spark, 40L)
    val words = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
    val shared = words.as("a").join(words.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only (i-1, i) pairs at i % 10 == 9 share words — exactly 47
    assert(shared.toSet == Set((8L, 9L, 47L), (18L, 19L, 47L),
      (28L, 29L, 47L), (38L, 39L, 47L)))
  }
}
