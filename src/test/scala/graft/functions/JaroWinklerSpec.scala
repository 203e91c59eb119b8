package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.JaroWinkler

/** Native Jaro–Winkler expression — the kernel is pinned against
  * independently computed reference values (cross-checked with
  * DuckDB's jaro_winkler_similarity, which the d64 oracle then
  * re-pins end-to-end), and the codegen path must agree with the
  * interpreted kernel.
  */
class JaroWinklerSpec extends SparkSpec {

  import spark.implicits._

  private val cases = Seq(
    // the textbook pair: jaro 0.944…, boost with l=3
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("dwayne", "duane", 0.8400000000000001),
    // window 0: adjacent transposition of a 2-char string matches nothing
    ("ab", "ba", 0.0),
    // jaro > 0.7 but common prefix 0: boost is a no-op
    ("crate", "trace", 0.7333333333333334),
    // jaro <= 0.7: the boost must NOT apply despite prefix 2
    ("abcdef", "abzzzz", 0.5555555555555555),
    ("abcdefgh", "abzzzzzz", 0.5),
    ("same", "same", 1.0),
    ("", "x", 0.0))

  test("kernel matches the reference values exactly") {
    cases.foreach { case (a, b, want) =>
      val got = JaroWinkler.compute(a, b)
      assert(math.abs(got - want) < 1e-12, s"jw('$a','$b') = $got, want $want")
      assert(math.abs(JaroWinkler.compute(b, a) - want) < 1e-12, "must be symmetric")
    }
  }

  test("codegen'd column form agrees with the kernel; nulls propagate") {
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(col("a"), col("b"), JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
    df.collect().foreach { r =>
      val want = JaroWinkler.compute(r.getString(0), r.getString(1))
      assert(r.getDouble(2) == want, s"${r.getString(0)}/${r.getString(1)}")
    }
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw")).collect()
    assert(withNull.head.isNullAt(0))
    // stays inside whole-stage codegen: no eval-python, no UDF node
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
