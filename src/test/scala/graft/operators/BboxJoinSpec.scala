package graft.operators

import graft.SparkSpec

/** Grid-bucketed IoU join: exact arithmetic, reference-point dedup
  * (multi-cell pairs counted once), touch-at-edge inclusion,
  * disjoint exclusion, cell-size invariance.
  */
class BboxJoinSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Long, Long, Long)]) =
    rows.toDF("comp", "ymin", "ymax", "xmin", "xmax")

  test("hand IoU values, dedup across cells, disjoint excluded") {
    // a1: 10x10 box; a2 far away
    val a = df(Seq((1L, 0L, 9L, 0L, 9L), (2L, 100L, 109L, 100L, 109L)))
    // b1 overlaps a1's bottom-right quarter (5..14)²: inter 5x5=25,
    //   union 100+100-25=175 → IoU 142857 micro
    // b2 touches a1 at exactly one corner pixel (9,9): inter 1,
    //   union 100+100-1=199 → 5025 micro
    // b3 disjoint from everything
    val b = df(Seq((11L, 5L, 14L, 5L, 14L), (12L, 9L, 18L, 9L, 18L),
      (13L, 50L, 59L, 50L, 59L)))
    for (cell <- Seq(4L, 16L, 1024L)) {
      val got = BboxJoin.iouPairs(a, b, cell).orderBy("comp_a", "comp_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == Seq(
        (1L, 11L, 25L, 142857L),
        (1L, 12L, 1L, 5025L)), s"cell $cell")
    }
    // identical boxes → IoU exactly 10⁶
    val self = BboxJoin.iouPairs(a, a, 8L)
      .filter($"comp_a" === $"comp_b").collect()
    assert(self.length == 2 && self.forall(_.getLong(3) == 1000000L))
    intercept[IllegalArgumentException](BboxJoin.iouPairs(a, b, 0L))
  }
}
