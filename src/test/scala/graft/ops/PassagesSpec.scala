package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Passage windowing (Passages.scala) — the traps: tail-window
  * clamping, full coverage with the declared overlap, short/empty
  * documents, parameter validation.
  */
class PassagesSpec extends SparkSpec {

  import spark.implicits._

  test("starts advance by stride; tail clamps; every word is covered") {
    val docs = Seq((1L, (0 until 11).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Passages.windows(docs, window = 4, stride = 3)
      .orderBy("win_id").collect()
    // n=11: ceil((11-4)/3)=3 → 4 windows at 0,3,6,9; the last has 2 words
    assert(out.map(_.getAs[Int]("start_word")).toSeq == Seq(0, 3, 6, 9))
    assert(out.map(_.getAs[Int]("n_words")).toSeq == Seq(4, 4, 4, 2))
    assert(out.head.getAs[String]("head_word") == "w0")
    assert(out.head.getAs[String]("tail_word") == "w3")
    assert(out.last.getAs[String]("head_word") == "w9")
    assert(out.last.getAs[String]("tail_word") == "w10")
    // consecutive windows overlap by window − stride = 1 word
    assert(out(0).getAs[String]("tail_word") == "w3" &&
      out(1).getAs[String]("head_word") == "w3")
  }

  test("short doc is one whole-doc window; empty doc emits nothing") {
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = Passages.windows(docs, window = 8, stride = 4).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("doc_id") == 1L)
    assert(out.head.getAs[Int]("n_words") == 3)
  }

  test("identical passages hash identically across documents") {
    val docs = Seq((1L, "x y z"), (2L, "x y z"), (3L, "x y q"))
      .toDF("doc_id", "text")
    val h = Passages.windows(docs, window = 8, stride = 8)
      .select("doc_id", "passage_hash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h(1L) == h(2L) && h(1L) != h(3L))
    intercept[IllegalArgumentException](Passages.windows(docs, 4, 5))
    intercept[IllegalArgumentException](Passages.windows(docs, 0, 0))
  }
}
