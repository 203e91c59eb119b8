package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring — the CCNet/Gopher-style perplexity
  * quality filter: train token statistics on a reference slice, score
  * every document by its average bigram log-probability, keep the
  * low-perplexity tail. Rule-based gates (t53) measure surface shape;
  * this measures how LM-like the text is, which is the filter
  * production corpora actually rank on (CCNet, arXiv:1911.00359).
  *
  * Scale posture: one corpus pass explodes adjacent bigrams straight
  * out of the split array (no window shuffle, no self-join); counts
  * are two aggregations on token keys; scoring is two LEFT joins of
  * corpus bigrams against the (much smaller) distinct-bigram and
  * distinct-left-token count tables plus a broadcast 1-row vocabulary
  * scalar. Everything is linear in corpus tokens; nothing enumerates
  * pairs of documents.
  *
  * Determinism: probabilities are exact integer ratios evaluated in
  * one IEEE division; only the per-doc sum of logs is order-sensitive
  * (ulp-level), so `avg_logp`/`ppl` round to 6dp on both engines per
  * the house oracle-parity rules.
  */
object LangModel {

  private def words(textCol: Column): Column =
    filter(split(textCol, "\\s+"), w => length(w) > 0)

  /** Add-one-smoothed bigram perplexity of every doc, trained on the
    * `doc_id < trainMaxId` slice: p(b|a) = (c2(a,b)+1) / (c1(a)+V)
    * with c1 the count of `a` as a bigram left and V the trained
    * vocabulary size. Docs shorter than one bigram drop out.
    */
  def perplexity(docs: DataFrame, trainMaxId: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val d = docs
      .select(col(idCol).cast("long").as("doc_id"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
    val bg = d.select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("a"),
          element_at(col("ws"), i + 2).as("b")))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))

    val train = bg.filter(col("doc_id") < trainMaxId)
    val c2 = train.groupBy("a", "b").agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy("a").agg(count(lit(1)).as("c1"))
    // V is ONE number — collect it (metadata-sized, the d42-stats
    // precedent) so an empty training slice refuses loudly instead of
    // emitting Infinity scores, and the plan loses a 1-row join
    val v: Long = docs
      .select(col(idCol).cast("long").as("doc_id"), words(col(textCol)).as("ws"))
      .filter(col("doc_id") < trainMaxId)
      .select(explode(col("ws")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
      .head().getLong(0)
    require(v > 0, s"empty LM training slice (no docs below id $trainMaxId " +
      "have words) — every score would be meaningless")

    val scored = bg
      .join(c2, Seq("a", "b"), "left")
      .join(c1, Seq("a"), "left")
      .select(col("doc_id"),
        coalesce(col("c2"), lit(0L)).as("c2n"),
        coalesce(col("c1"), lit(0L)).as("c1n"))
      .withColumn("logp",
        log((col("c2n") + lit(1)).cast("double") / (col("c1n") + lit(v))))

    scored.groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_bigrams"),
        sum(when(col("c2n") === 0, 1).otherwise(0)).cast("int").as("n_unseen"),
        sum(col("c2n")).cast("bigint").as("sum_c2"),
        round(sum(col("logp")) / count(lit(1)), 6).as("avg_logp"),
        round(exp(-sum(col("logp")) / count(lit(1))), 6).as("ppl"))
  }

  /** Interpolated Kneser–Ney bigram perplexity (Kneser & Ney 1995;
    * Chen & Goodman 1999 eq. 18) — the smoothing production LM
    * filters actually use (KenLM's default), replacing add-one's
    * vocabulary-sized flattening with absolute discounting plus a
    * continuation-probability backoff:
    *
    *   p(b|a) = (max(c(a,b)−D, 0) + D·N1+(a·)·pc(b)) / c(a·)
    *   pc(b)  = N1+(·b) / T      (distinct left-contexts of b over
    *                              total distinct bigram types)
    *
    * with D = 0.75 (exact in binary, so the discount adds no float
    * noise), pc(b) floored at 1/(V+1) for words never seen as a
    * bigram right (the unknown-continuation mass), and an unseen left
    * context backing off to pc(b) alone.
    *
    * Scale shape mirrors [[perplexity]]: ALL count tables (c1, N1+
    * left and right, T) derive from the one c2 aggregation — one
    * bigram-key shuffle for training, then map-side-joinable lookups;
    * T and V are collected scalars (metadata-sized, loud refusal on
    * an empty slice). Corpus scoring is the same three LEFT joins.
    */
  def knPerplexity(docs: DataFrame, trainMaxId: Long, discount: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val d = docs
      .select(col(idCol).cast("long").as("doc_id"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
    val bg = d.select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("a"),
          element_at(col("ws"), i + 2).as("b")))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))

    // one training aggregation; every model table derives from it
    val c2 = bg.filter(col("doc_id") < trainMaxId)
      .groupBy("a", "b").agg(count(lit(1)).as("c2"))
    val left = c2.groupBy("a").agg(
      sum(col("c2")).as("c1"), count(lit(1)).as("n1a"))
    val right = c2.groupBy("b").agg(count(lit(1)).as("nb"))
    val t: Long = c2.count()
    require(t > 0, s"empty KN training slice (no docs below id $trainMaxId " +
      "have bigrams) — every score would be meaningless")
    val v: Long = docs
      .select(col(idCol).cast("long").as("doc_id"), words(col(textCol)).as("ws"))
      .filter(col("doc_id") < trainMaxId)
      .select(explode(col("ws")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
      .head().getLong(0)

    val pcb = when(col("nb").isNotNull, col("nb").cast("double") / t)
      .otherwise(lit(1.0) / (v + 1))
    val seenLeft = col("c1").isNotNull
    val disc = lit(discount)
    val logp = when(seenLeft,
        log((greatest(coalesce(col("c2"), lit(0L)).cast("double") - disc, lit(0.0))
          + disc * col("n1a") * col("pcb")) / col("c1")))
      .otherwise(log(col("pcb")))

    bg.join(c2, Seq("a", "b"), "left")
      .join(left, Seq("a"), "left")
      .join(right, Seq("b"), "left")
      .withColumn("pcb", pcb)
      .withColumn("logp", logp)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_bigrams"),
        sum(when(col("c2").isNull, 1).otherwise(0)).cast("int").as("n_unseen"),
        sum(when(col("c1").isNull, 1).otherwise(0)).cast("int").as("n_backoff"),
        round(sum(col("logp")) / count(lit(1)), 6).as("avg_logp"),
        round(exp(-sum(col("logp")) / count(lit(1))), 6).as("ppl"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    * every doc with the add-one bigram LM, split the corpus into
    * head / middle / tail thirds by perplexity, keep head+middle —
    * the standard quality cut that drops the most-surprising third.
    *
    * Thresholds are the exact discrete tertiles of the 6dp-quantized
    * perplexity (micro units), computed by the two-phase percentile
    * machinery ([[Percentiles.twoPhaseDiscrete]]) — never a global
    * sort or a single-task window — then collected (exactly 2 rows)
    * and compared map-side. At 100 TB the scoring joins are the
    * [[perplexity]] shapes (one bigram-key shuffle for training,
    * broadcast-able count tables) and the cut itself is a projection.
    *
    * Output: (doc_id, ppl, bucket, keep), bucket ∈ head|middle|tail,
    * keep = bucket ≠ tail. Boundary docs tie into the LOWER bucket
    * (ppl ≤ threshold), deterministic on any engine.
    */
  def perplexityBuckets(docs: DataFrame, trainMaxId: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // the scored table feeds TWO actions (the percentile collect and
    // the caller's final projection); without a cache the whole
    // perplexity pipeline — bigram explode, two model joins, per-doc
    // aggregation — executes twice (guide §5: reuse × recompute cost
    // justifies the persist; rows are (doc_id, ppl, ppl_micro), narrow)
    val scored = perplexity(docs, trainMaxId, idCol, textCol)
      .select(col("doc_id"), col("ppl"),
        expr("CAST(round(ppl * 1e6) AS BIGINT)").as("ppl_micro"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val th = Percentiles.twoPhaseDiscrete(
        scored.withColumn("g", lit(1)), "g", "ppl_micro",
        qs = Seq(0.333333, 0.666667))
      .collect().map(r => (r.getAs[Double]("q"), r.getAs[Long]("value"))).toMap
    val (t1, t2) = (th(0.333333), th(0.666667))
    // release the cache before returning (every other persist in ops/
    // pairs with an unpersist): the caller's projection reads the
    // narrow eager checkpoint — materialized straight from the cache,
    // so the pipeline still executes exactly once
    val scoredCp = scored.localCheckpoint(eager = true)
    scored.unpersist()
    scoredCp
      .withColumn("bucket",
        when(col("ppl_micro") <= t1, "head")
          .when(col("ppl_micro") <= t2, "middle")
          .otherwise("tail"))
      .withColumn("keep", col("bucket") =!= "tail")
      .select("doc_id", "ppl", "bucket", "keep")
  }

  /** Good–Turing frequency-of-frequencies table (Gale & Sampson's
    * input): for every observed word frequency r, how many distinct
    * words occur exactly r times (N_r), plus the Turing-smoothed
    * adjusted count r* = (r+1)·N_{r+1}/N_r — the table every
    * discount-based smoother (and the unseen-mass estimate N_1/N)
    * reads, and a standard corpus-health diagnostic (a Zipfian corpus
    * shows N_r ∝ r^{-2}; dedup failures distort the head).
    *
    * Scale shape: the corpus pass is the word histogram (one
    * map-side-combinable shuffle); count-of-counts is a second tiny
    * aggregation ON the histogram, and the N_{r+1} lookup is a
    * self-join of the (distinct-r)-row table — broadcast at runtime.
    * r* stays an exact integer in milli units.
    *
    * Output: (r, n_r, n_r_plus_1, r_star_milli) for every observed r.
    */
  def goodTuring(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val hist = docs.select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("r"))
    val coc = hist.groupBy(col("r")).agg(count(lit(1)).cast("long").as("n_r"))
    coc.join(
        coc.select((col("r") - 1).as("r"), col("n_r").as("n_r_plus_1")),
        Seq("r"), "left")
      .select(col("r"), col("n_r"),
        coalesce(col("n_r_plus_1"), lit(0L)).as("n_r_plus_1"),
        expr("((r + 1) * coalesce(n_r_plus_1, 0) * 1000) div n_r")
          .as("r_star_milli"))
  }
}
