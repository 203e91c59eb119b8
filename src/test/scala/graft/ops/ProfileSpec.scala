package graft.ops

import graft.SparkSpec

/** Column profiler semantics — the traps: native-type ordering for
  * min/max (not string order), null accounting, dominant-value ties.
  */
class ProfileSpec extends SparkSpec {

  import spark.implicits._

  test("native-type min/max: 9 < 10 numerically even though '9' > '10'") {
    val df = Seq(9, 10, 100, 2).toDF("n")
    val r = Profile.profile(df, Seq("n")).collect().head
    assert(r.getAs[String]("min_s") == "2" && r.getAs[String]("max_s") == "100")
  }

  test("nulls counted out of stats but into n_nulls; distinct ignores null") {
    val df = Seq(Some("a"), None, Some("b"), Some("a"), None).toDF("s")
    val r = Profile.profile(df, Seq("s")).collect().head
    assert(r.getAs[Long]("n_rows") == 5 && r.getAs[Long]("n_nulls") == 2)
    assert(r.getAs[Long]("n_distinct") == 2)
    assert(r.getAs[String]("top_val") == "a" && r.getAs[Long]("top_n") == 2)
  }

  test("dominant-value ties break toward the smaller value") {
    val df = Seq("b", "a", "b", "a", "c").toDF("s")
    val r = Profile.profile(df, Seq("s")).collect().head
    assert(r.getAs[String]("top_val") == "a" && r.getAs[Long]("top_n") == 2)
  }

  test("all-NULL column still emits its row: n_nulls=n_rows, n_distinct=0") {
    val df = Seq((1, None: Option[String]), (2, None), (3, None))
      .toDF("a", "s")
    val rows = Profile.profile(df, Seq("a", "s")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size == 2, "the all-NULL column must not vanish")
    val s = rows("s")
    assert(s.getAs[Long]("n_rows") == 3 && s.getAs[Long]("n_nulls") == 3)
    assert(s.getAs[Long]("n_distinct") == 0 && s.getAs[Long]("top_n") == 0)
    assert(s.getAs[String]("top_val") == null)
  }

  test("multi-column profile keeps columns independent; unknown column refuses") {
    val df = Seq((1, "x"), (2, "x"), (3, "y")).toDF("a", "b")
    val rows = Profile.profile(df, Seq("a", "b")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows("a").getAs[Long]("n_distinct") == 3)
    assert(rows("b").getAs[Long]("n_distinct") == 2)
    assert(rows("b").getAs[String]("top_val") == "x")
    intercept[IllegalArgumentException](Profile.profile(df, Seq("a", "zzz")))
    intercept[IllegalArgumentException](Profile.profile(df, Nil))
  }
}
