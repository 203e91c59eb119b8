package graft.ops

import graft.SparkSpec

/** The 1M-hash bench key (`m_imgdedup1m`) at spec scale: every
  * structural assertion in [[ImgDedupRehearsal.run]] — family
  * cohesion, single-representative clique collapse, cluster-count
  * envelope — must hold at 20k hashes + a 500-member clique.
  */
class ImgDedupRehearsalSpec extends SparkSpec {

  test("planted structure recovered at 20k hashes") {
    val sec = ImgDedupRehearsal.run(spark, n = 20000L, clique = 500L)
    assert(sec > 0.0)
  }

  test("family hashes sit within the banded radius; scatter does not") {
    import spark.implicits._
    val rows = ImgDedupRehearsal.synth(spark, 100L, 0L)
      .as[(Long, Long)].collect().toMap
    // family 0 = ids 0..4: pairwise Hamming <= 2
    for (a <- 0L to 4L; b <- a + 1 to 4L)
      assert(java.lang.Long.bitCount(rows(a) ^ rows(b)) <= 2, s"$a,$b")
    // scatter ids are far from their family neighbors
    assert(java.lang.Long.bitCount(rows(5L) ^ rows(6L)) > 3)
  }
}
