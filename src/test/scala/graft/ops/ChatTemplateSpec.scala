package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chat-template invariants: mask spans select EXACTLY the assistant
  * contents (substring extraction proves it — no arithmetic
  * cross-check, the actual characters), turn order survives shuffled
  * input, and non-assistant roles never enter the mask.
  */
class ChatTemplateSpec extends SparkSpec {

  test("mask spans extract exactly the assistant contents, in turn order") {
    import spark.implicits._
    val turns = Seq(
      (1L, 2, "assistant", "second answer"),
      (1L, 0, "user", "a question"),
      (1L, 1, "assistant", "first answer"),
      (2L, 0, "system", "sys"),
      (2L, 1, "user", "only user here")).toDF("conv_id", "turn", "role", "content")
    val rows = ChatTemplate.render(turns).orderBy("conv_id").collect()
    val r1 = rows(0)
    assert(r1.getAs[Int]("n_turns") == 3 && r1.getAs[Int]("n_assistant_turns") == 2)
    val text = r1.getAs[String]("text")
    val st = r1.getSeq[Int](r1.fieldIndex("mask_starts"))
    val en = r1.getSeq[Int](r1.fieldIndex("mask_ends"))
    val extracted = st.zip(en).map { case (s, e) => text.substring(s, e) }
    assert(extracted == Seq("first answer", "second answer"))
    assert(r1.getAs[Long]("mask_chars") == "first answer".length + "second answer".length)
    // rendered shape: shuffled input still renders in turn order
    assert(text.startsWith("<|user|>\na question<|end|>\n<|assistant|>\nfirst answer<|end|>\n"))
    // conversation with no assistant turn: empty mask
    val r2 = rows(1)
    assert(r2.getAs[Int]("n_assistant_turns") == 0)
    assert(r2.getSeq[Int](r2.fieldIndex("mask_starts")).isEmpty)
    assert(r2.getAs[Long]("mask_chars") == 0L)
  }

  test("deterministic across partitioning") {
    import spark.implicits._
    val turns = (0L until 50L).flatMap { c =>
      Seq((c, 0, "user", s"q$c"), (c, 1, "assistant", s"a$c"))
    }.toDF("conv_id", "turn", "role", "content")
    val a = ChatTemplate.render(turns).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val b = ChatTemplate.render(turns.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(a == b && a.size == 50)
  }
}
