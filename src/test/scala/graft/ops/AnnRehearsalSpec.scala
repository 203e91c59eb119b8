package graft.ops

import graft.SparkSpec

/** Spec-sized run of the [[AnnRehearsal]] cascade: the recall
  * require() inside `run` is the assertion — IVF recovers ≥ 90% of
  * the brute-force top-k on a clustered corpus. Plus determinism of
  * the synthetic corpus across partitionings.
  */
class AnnRehearsalSpec extends SparkSpec {

  test("IVF holds the recall floor against brute force at 20k vectors") {
    val secs = AnnRehearsal.run(spark, n = 20000L, nQueries = 8, k = 5,
      clusters = 16, nlist = 16, nprobe = 4)
    assert(secs > 0.0)
  }

  test("synthetic corpus is reproducible under any partitioning") {
    val a = AnnRehearsal.synth(spark, 100L, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = AnnRehearsal.synth(spark, 100L, dim = 8).repartition(7)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.size == 100 && a == b)
    // vectors of the same cluster sit near each other, different far
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (u, v) => u * v }.sum
      d / math.sqrt(x.map(v => v * v).sum * y.map(v => v * v).sum)
    }
    assert(cos(a(0L), a(64L)) > cos(a(0L), a(1L))) // 0 and 64 share cluster 0
  }
}
