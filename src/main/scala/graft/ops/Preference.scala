package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair construction (DPO/RLHF data prep, Rafailov et al.
  * 2023): from scored candidate responses per prompt, build one
  * (chosen, rejected) training pair — highest vs lowest score, exact
  * integer milli-scores, deterministic id tie-breaks, and NO pair
  * when the margin is zero (a tie expresses no preference; training
  * on it teaches noise).
  *
  * Scale shape: one groupBy on the prompt key with two struct
  * min/max aggregates (map-side combinable) — never a window over
  * the response table, never a per-prompt sort. Ties break toward
  * the SMALLER response id on both sides (max compares (score, −id),
  * min compares (score, id)), so the pair is bit-reproducible.
  */
object Preference {

  /** Input: (promptCol, idCol, textCol, scoreCol[int milli]).
    * Output: (prompt_id, chosen_id, rejected_id, chosen_text,
    * rejected_text, margin_milli), margin > 0 only.
    */
  def dpoPairs(responses: DataFrame, promptCol: String = "prompt_id",
      idCol: String = "resp_id", textCol: String = "text",
      scoreCol: String = "score_milli"): DataFrame = {
    val base = responses.select(
      col(promptCol).cast("long").as("prompt_id"),
      col(idCol).cast("long").as("resp_id"),
      col(textCol).as("_t"),
      col(scoreCol).cast("long").as("_s"))
    base.groupBy(col("prompt_id"))
      .agg(
        max(struct(col("_s"), (-col("resp_id")).as("_nid"),
          col("resp_id"), col("_t"))).as("c"),
        min(struct(col("_s"), col("resp_id"), col("_t"))).as("r"))
      .select(col("prompt_id"),
        col("c.resp_id").as("chosen_id"),
        col("r.resp_id").as("rejected_id"),
        col("c._t").as("chosen_text"),
        col("r._t").as("rejected_text"),
        (col("c._s") - col("r._s")).as("margin_milli"))
      .filter(col("margin_milli") > 0)
  }

  /** Best-of-n rejection sampling (WebGPT / Llama-2 style): per
    * prompt, keep the single highest-scored response of its n
    * candidates — the other standard reward-model data op next to
    * [[dpoPairs]]. Same scale shape: ONE prompt-key groupBy with a
    * struct max plus count/sum — map-side combinable, never a window
    * or per-prompt sort; ties break toward the smaller response id
    * (max compares (score, −id)), so selection is bit-reproducible.
    *
    * The selection margin stays an exact integer by reporting
    * `margin_x_n_milli` = n·best − Σscores (= n · (best − mean), so
    * positive unless every candidate ties the best) instead of a
    * float mean — an oracle can replay it without IEEE rounding.
    *
    * Output: (prompt_id, n, best_id, best_text, best_milli,
    * sum_milli, margin_x_n_milli). Every prompt emits exactly one
    * row (a best-of-1 prompt keeps its only response, margin 0).
    */
  def bestOfN(responses: DataFrame, promptCol: String = "prompt_id",
      idCol: String = "resp_id", textCol: String = "text",
      scoreCol: String = "score_milli"): DataFrame = {
    val base = responses.select(
      col(promptCol).cast("long").as("prompt_id"),
      col(idCol).cast("long").as("resp_id"),
      col(textCol).as("_t"),
      col(scoreCol).cast("long").as("_s"))
    base.groupBy(col("prompt_id"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        max(struct(col("_s"), (-col("resp_id")).as("_nid"),
          col("resp_id"), col("_t"))).as("b"),
        sum(col("_s")).as("sum_milli"))
      .select(col("prompt_id"), col("n"),
        col("b.resp_id").as("best_id"),
        col("b._t").as("best_text"),
        col("b._s").as("best_milli"),
        col("sum_milli"),
        (col("n") * col("b._s") - col("sum_milli")).as("margin_x_n_milli"))
  }
}
