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

  test("decon rehearsal recovers planted quotes at spec scale (exact plan)") {
    // 2k docs / 100 bench: below the bloom floor, so run() also
    // asserts the auto screen kept the exact single-join plan
    val secs = DeconRehearsal.run(spark, n = 2000L, b = 100L)
    assert(secs > 0.0)
  }

  test("collapsed pipeline recovers the identical partition as the direct path") {
    import org.apache.spark.sql.functions._
    // 600 docs + a 50-doc identical clique: big enough for real
    // near-dup plants, small enough to run the direct path too
    val docs = DedupRehearsal.synth(spark, 600L, boilerplate = 50L)
      .persist()
    val direct = {
      val pairs = TextDedup.minHashNearDups(docs, minJaccard = 0.8)
      TextDedup.connectedComponents(pairs.select("doc_a", "doc_b"),
        docs.select("doc_id"))
    }
    val collapsed = TextDedup.collapsedNearDupClusters(docs, minJaccard = 0.8)
    val a = direct.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = collapsed.select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == 650 && a == b)
    // the clique really is one cluster labeled by its min id (600)
    assert((600L until 650L).forall(id => b(id) == 600L))
    docs.unpersist()
  }

  test("collapsed rehearsal asserts structure at spec scale") {
    val secs = DedupRehearsal.runCollapsed(spark, n = 2000L, boilerplate = 100L)
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
