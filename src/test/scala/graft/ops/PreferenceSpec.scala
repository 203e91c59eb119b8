package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DPO pair semantics: argmax/argmin with id tie-breaks, zero-margin
  * drop, and single-response prompts emitting nothing.
  */
class PreferenceSpec extends SparkSpec {

  test("chosen is highest score, rejected lowest, ties break to smaller id") {
    import spark.implicits._
    val r = Seq(
      // prompt 1: clear winner/loser
      (1L, 0L, "bad", 100L), (1L, 1L, "good", 900L), (1L, 2L, "mid", 500L),
      // prompt 2: two-way tie at the top (ids 1, 2) and bottom (ids 0, 3)
      (2L, 0L, "low-a", 100L), (2L, 3L, "low-b", 100L),
      (2L, 1L, "hi-a", 700L), (2L, 2L, "hi-b", 700L),
      // prompt 3: all equal — no preference, no pair
      (3L, 0L, "x", 400L), (3L, 1L, "y", 400L),
      // prompt 4: single response — margin zero with itself, no pair
      (4L, 0L, "solo", 500L)).toDF("prompt_id", "resp_id", "text", "score_milli")
    val out = Preference.dpoPairs(r).orderBy("prompt_id").collect()
    assert(out.length == 2)
    val p1 = out(0)
    assert(p1.getAs[Long]("chosen_id") == 1L && p1.getAs[Long]("rejected_id") == 0L)
    assert(p1.getAs[String]("chosen_text") == "good")
    assert(p1.getAs[Long]("margin_milli") == 800L)
    val p2 = out(1)
    assert(p2.getAs[Long]("chosen_id") == 1L, "top tie must break to smaller id")
    assert(p2.getAs[Long]("rejected_id") == 0L, "bottom tie must break to smaller id")
    assert(p2.getAs[Long]("margin_milli") == 600L)
  }

  test("deterministic across partitioning") {
    import spark.implicits._
    val r = (0L until 40L).flatMap { p =>
      (0L until 4L).map(i => (p, i, s"t$p-$i", (p * 7 + i * 13) % 1000))
    }.toDF("prompt_id", "resp_id", "text", "score_milli")
    val a = Preference.dpoPairs(r).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val b = Preference.dpoPairs(r.repartition(7)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("bestOfN: argmax with id tie-break, exact margin, every prompt emits") {
    import spark.implicits._
    val r = Seq(
      // prompt 1: winner id 1 at 900; sum 1500, n 3 → margin 3·900−1500
      (1L, 0L, "bad", 100L), (1L, 1L, "good", 900L), (1L, 2L, "mid", 500L),
      // prompt 2: top tie (ids 1, 2 at 700) → smaller id wins
      (2L, 2L, "hi-b", 700L), (2L, 1L, "hi-a", 700L), (2L, 0L, "low", 100L),
      // prompt 3: all equal — still emits, margin 0
      (3L, 0L, "x", 400L), (3L, 1L, "y", 400L),
      // prompt 4: best-of-1 keeps its only response, margin 0
      (4L, 0L, "solo", 500L)).toDF("prompt_id", "resp_id", "text", "score_milli")
    val out = Preference.bestOfN(r).orderBy("prompt_id").collect()
    assert(out.length == 4, "every prompt emits exactly one row")
    val p1 = out(0)
    assert(p1.getAs[Long]("best_id") == 1L && p1.getAs[String]("best_text") == "good")
    assert(p1.getAs[Long]("margin_x_n_milli") == 3 * 900 - 1500)
    assert(out(1).getAs[Long]("best_id") == 1L, "top tie must break to smaller id")
    assert(out(2).getAs[Long]("margin_x_n_milli") == 0L)
    assert(out(3).getAs[Long]("best_id") == 0L &&
      out(3).getAs[Long]("margin_x_n_milli") == 0L)
  }

  test("bestOfN deterministic across partitioning") {
    import spark.implicits._
    val r = (0L until 40L).flatMap { p =>
      (0L until 4L).map(i => (p, i, s"t$p-$i", (p * 7 + i * 13) % 1000))
    }.toDF("prompt_id", "resp_id", "text", "score_milli")
    val a = Preference.bestOfN(r).collect()
      .map(x => (x.getLong(0), x.getAs[Long]("best_id"))).toSet
    val b = Preference.bestOfN(r.repartition(7)).collect()
      .map(x => (x.getLong(0), x.getAs[Long]("best_id"))).toSet
    assert(a == b && a.size == 40)
  }
}
