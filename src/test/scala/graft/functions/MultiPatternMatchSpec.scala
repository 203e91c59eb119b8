package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.{AhoCorasick, MultiPatternMatch}

/** Aho–Corasick semantics: the automaton must agree with naive
  * substring search on every input, including the fail-link cases
  * (suffix-overlapping patterns) a broken construction gets wrong.
  */
class MultiPatternMatchSpec extends SparkSpec {

  import spark.implicits._

  private def naive(text: String, pats: Seq[String]): Seq[Int] =
    pats.zipWithIndex.collect { case (p, i) if text.contains(p) => i }

  private def viaDf(texts: Seq[String], pats: Seq[String]): Seq[Seq[Int]] = {
    val out = texts.toDF("t")
      .withColumn("id", monotonically_increasing_id())
      .select(col("id"), MultiPatternMatch.multiMatch(col("t"), pats).as("m"))
      .orderBy("id").collect()
    out.map(_.getSeq[Int](1).toSeq).toSeq
  }

  test("random small-alphabet fuzz: automaton ≡ naive contains") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abc"
    def rs(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(3))).mkString
    for (_ <- 0 until 30) {
      val pats = (0 until 8).map(_ => rs(1 + rnd.nextInt(4))).distinct
      val texts = (0 until 20).map(_ => rs(rnd.nextInt(40)))
      val ac = new AhoCorasick(pats.map(_.getBytes("UTF-8")).toArray)
      texts.foreach { t =>
        val bytes = t.getBytes("UTF-8")
        val hits = ac.matchIdSet(bytes, 0, bytes.length)
        val got = Iterator.iterate(hits.nextSetBit(0))(i => hits.nextSetBit(i + 1))
          .takeWhile(_ >= 0).toSeq
        assert(got == naive(t, pats), s"text '$t' pats $pats")
      }
    }
  }

  test("suffix-overlapping patterns surface through fail links") {
    // "she" ends at a node whose fail chain carries "he" and "e":
    // all three must report — the classic AC textbook case
    val pats = Seq("he", "she", "e", "her")
    assert(viaDf(Seq("she", "ushers", "hex", "xyz"), pats) ==
      Seq(Seq(0, 1, 2), Seq(0, 1, 2, 3), Seq(0, 2), Seq()))
  }

  test("multi-byte UTF-8 patterns match exactly, no false aliasing") {
    val pats = Seq("héllo", "hél", "llo", "日本語")
    assert(viaDf(Seq("say héllo twice", "日本語テキスト", "hello"), pats) ==
      Seq(Seq(0, 1, 2), Seq(3), Seq(2)))
  }

  test("null text yields null; empty patterns refuse") {
    val r = Seq((1L, "abc"), (2L, null)).toDF("id", "t")
      .select(col("id"), MultiPatternMatch.multiMatch(col("t"), Seq("b")).as("m"))
      .orderBy("id").collect()
    assert(r(0).getSeq[Int](1) == Seq(0) && r(1).isNullAt(1))
    intercept[IllegalArgumentException](new AhoCorasick(Array.empty))
    intercept[IllegalArgumentException](new AhoCorasick(Array(Array.emptyByteArray)))
  }

  test("SQL registration form works inside whole-stage codegen") {
    MultiPatternMatch.register(spark, Seq("agg", "scan query"))
    // literal input constant-folds at optimization time (the
    // expression is eval-able at plan time — desirable); a column
    // input must instead run inside a WholeStageCodegen project
    val folded = spark.sql("SELECT multi_match('scan query agg plan') AS m")
    assert(folded.collect().head.getSeq[Int](0) == Seq(0, 1))
    val df = spark.range(3).selectExpr(
      "multi_match(concat('scan query #', CAST(id AS STRING))) AS m")
    val plan = df.queryExecution.executedPlan.toString
    // "*(1)" is the whole-stage-codegen marker in the abbreviated form
    assert(plan.contains("multi_match") && plan.contains("*(1) Project"), plan)
    assert(df.collect().forall(_.getSeq[Int](0) == Seq(1)))
  }
}
