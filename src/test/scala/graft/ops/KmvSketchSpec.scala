package graft.ops

import graft.SparkSpec

/** KMV overlap-estimate invariants: exact below k (the sketch holds
  * everything), sane error above k on constructed overlaps, and the
  * degenerate identical/disjoint cases.
  */
class KmvSketchSpec extends SparkSpec {

  private def corpus(ids: Range, offset: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // each doc contributes 8 distinct shingles from a sliding window
    // over a 10-word line; word identity controls the overlap
    ids.map { i =>
      val words = (0 until 10).map(j => s"w${offset + i * 10 + j}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("below k the estimates are exact counts") {
    val a = corpus(0 until 3, 0)     // 24 shingles
    val b = corpus(2 until 5, 0)     // 24 shingles, 8 shared (doc 2)
    val row = KmvSketch.overlapEstimate(a, b, k = 256).head
    assert(row.getAs[Long]("k_union") == 40)
    assert(row.getAs[Double]("union_est") == 40.0)
    assert(row.getAs[Double]("inter_est") == 8.0)
  }

  test("identical slices estimate inter == union; disjoint estimate 0") {
    val a = corpus(0 until 4, 0)
    val same = KmvSketch.overlapEstimate(a, a, k = 16).head
    assert(same.getAs[Double]("inter_est") == same.getAs[Double]("union_est"))
    val b = corpus(0 until 4, 100000)
    val disj = KmvSketch.overlapEstimate(a, b, k = 16).head
    assert(disj.getAs[Double]("inter_est") == 0.0)
  }

  test("above k: estimates land within 4/sqrt(k) of truth on a planted overlap") {
    // 300 docs per side, 100 shared → true union 4000, inter 800
    val shared = corpus(0 until 100, 0)
    val a = shared.union(corpus(100 until 300, 1000000))
    val b = shared.union(corpus(100 until 300, 2000000))
    val row = KmvSketch.overlapEstimate(a, b, k = 256).head
    val u = row.getAs[Double]("union_est")
    val i = row.getAs[Double]("inter_est")
    val tol = 4.0 / math.sqrt(256.0) // 4σ of the KMV relative error
    assert(math.abs(u - 4000.0) / 4000.0 <= tol, s"union_est $u")
    assert(math.abs(i - 800.0) / 800.0 <= 2 * tol, s"inter_est $i")
  }
}
