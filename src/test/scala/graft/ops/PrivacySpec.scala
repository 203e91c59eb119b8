package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-anonymity generalization semantics. */
class PrivacySpec extends SparkSpec {

  import spark.implicits._

  private val rows = Seq(
    // (city, age_band, salary): (a, young) ×3, (a, old) ×1, (b, old) ×2
    ("a", "young", 10), ("a", "young", 20), ("a", "young", 30),
    ("a", "old", 40),
    ("b", "old", 50), ("b", "old", 60)).toDF("city", "age_band", "salary")

  test("groups below k generalize every quasi-id to '*'; others release") {
    val out = Privacy.kAnonymize(rows, Seq("city", "age_band"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(out == Set(
      ("a", "young", 10), ("a", "young", 20), ("a", "young", 30),
      ("*", "*", 40),
      ("b", "old", 50), ("b", "old", 60)))
  }

  test("the released table satisfies k-anonymity by construction") {
    for (k <- Seq(2L, 3L, 10L)) {
      val out = Privacy.kAnonymize(rows, Seq("city", "age_band"), k)
      val groupSizes = out.groupBy("city", "age_band").count()
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      // every non-suppressed group must have >= k rows
      groupSizes.foreach { case ((c, a), n) =>
        if (c != "*" || a != "*") assert(n >= k, s"group ($c,$a) size $n < $k")
      }
    }
    // k larger than every group: everything suppressed
    val all = Privacy.kAnonymize(rows, Seq("city", "age_band"), k = 10)
      .select("city", "age_band").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(all.toSeq == Seq(("*", "*")))
  }

  test("non-key columns pass through untouched; partitioning-invariant") {
    val a = Privacy.kAnonymize(rows, Seq("city"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val b = Privacy.kAnonymize(rows.repartition(7), Seq("city"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(a == b)
    // city 'a' has 4 rows (released), 'b' has 2 (suppressed); age_band
    // is NOT a key here and must survive verbatim on suppressed rows
    assert(a.contains(("*", "old", 50)) && a.contains(("a", "young", 10)))
    assert(a.map(_._3) == rows.collect().map(_.getInt(2)).toSet)
  }

  test("invalid arguments refuse loudly") {
    intercept[IllegalArgumentException](Privacy.kAnonymize(rows, Nil, 2))
    intercept[IllegalArgumentException](Privacy.kAnonymize(rows, Seq("city"), 0))
  }
}
