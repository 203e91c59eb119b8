package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chat-template rendering — the SFT (supervised fine-tuning) data
  * prep step: flatten (conversation, turn, role, content) rows into
  * one training string per conversation with role sentinels, plus
  * the LOSS-MASK character spans (train only on assistant turns —
  * the detail every SFT pipeline must get exactly right, and the one
  * an off-by-one silently corrupts).
  *
  * Template (ChatML-shaped, engine-neutral):
  *   `<|role|>\ncontent<|end|>\n` per turn, concatenated in turn
  * order. Mask spans are [start, end) character offsets of each
  * assistant turn's CONTENT within the rendered string.
  *
  * Scale shape: one groupBy on the conversation key; the render and
  * the span arithmetic are a single aggregation over the collected
  * turn structs (a conversation's turns fit in one row by
  * construction — conversations are documents, not corpora), with
  * the running character offset computed by a prefix scan inside the
  * sorted turn array. No window, no self-join, no second pass.
  */
object ChatTemplate {

  /** Render one training row per conversation. Input columns:
    * (convCol, turnCol, roleCol, contentCol). Output: (conv_id,
    * n_turns, n_assistant_turns, text, mask_starts, mask_ends,
    * mask_chars) where mask_starts/ends are aligned int arrays and
    * mask_chars = Σ (end − start).
    */
  def render(turns: DataFrame, convCol: String = "conv_id",
      turnCol: String = "turn", roleCol: String = "role",
      contentCol: String = "content"): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.select(col(convCol).cast("long"), col(turnCol).cast("int"),
        col(roleCol), col(contentCol))
      .as[(Long, Int, String, String)]
      .groupByKey(_._1)
      .mapGroups { (conv, it) =>
        val sorted = it.toArray.sortBy(_._2)
        val sb = new StringBuilder
        val starts = Array.newBuilder[Int]
        val ends = Array.newBuilder[Int]
        sorted.foreach { case (_, _, role, content) =>
          sb.append("<|").append(role).append("|>\n")
          val s = sb.length
          sb.append(content)
          if (role == "assistant") { starts += s; ends += sb.length }
          sb.append("<|end|>\n")
        }
        val st = starts.result()
        val en = ends.result()
        (conv, sorted.length, st.length, sb.toString,
          st, en, st.indices.map(i => (en(i) - st(i)).toLong).sum)
      }
      .toDF("conv_id", "n_turns", "n_assistant_turns", "text",
        "mask_starts", "mask_ends", "mask_chars")
  }
}
