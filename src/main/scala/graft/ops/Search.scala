package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Keyword relevance search over the document corpus — the
  * inverted-index probe shape a training-data pipeline uses for
  * contamination triage, corpus exploration, and eval-set curation.
  *
  * BM25 (Robertson/Spärck Jones, the Lucene `1 +` idf variant so
  * scores stay positive):
  *
  *   score(q, d) = Σ_{t ∈ q} ln(1 + (N − df + 0.5)/(df + 0.5))
  *                 · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Execution shape (the 100 TB posture):
  *  - the query set is tiny and BROADCAST; the corpus-side token
  *    explode is filtered to query terms BEFORE the tf aggregation,
  *    so only postings of probed terms ever shuffle — exactly what an
  *    inverted-index lookup reads, never the full term dictionary;
  *  - document lengths and corpus totals (N, Σdl) are one map-side-
  *    combinable aggregation each;
  *  - per-term document frequencies aggregate only over the pruned
  *    postings;
  *  - the final per-query top-k is a window over candidate docs only
  *    (docs sharing ≥ 1 term with the query).
  *
  * Engine parity: each term's contribution is computed in doubles
  * from exact integers (tf, df, N, dl are BIGINTs; avgdl is one
  * division of exact integers), 6dp-rounded, and quantized to
  * micro-units — the per-(query, doc) SUM is then an exact BIGINT
  * sum, associative and order-independent, so the score and the
  * (score desc, doc_id) ranking are bit-identical in any engine.
  */
object Search {

  /** Tiny (query_id, query_text) relation from literal pairs. */
  def queryTable(spark: SparkSession, queries: Seq[(Int, String)]): DataFrame = {
    import spark.implicits._
    queries.toDF("query_id", "query_text")
  }

  /** BM25 top-k per query. `queries` is a small (query_id,
    * query_text) relation; terms are the same whitespace tokens as
    * the corpus tokenizer (duplicate query terms count once — the
    * standard bag-of-documents form).
    *
    * Output: (query_id, rank, doc_id, score_micro, score) — rank by
    * score desc then doc_id asc; score = score_micro / 1e6.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import TextDedup.words

    // per-doc length, computed once and reused by tf and the corpus
    // totals (one tokenize per doc)
    val docLen = docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // corpus totals: N docs, Σdl — a single 1-row aggregate
    val totals = docLen.agg(
      count(lit(1)).as("n_docs"), sum(size(col("ws"))).as("sum_dl"))

    // distinct query terms, broadcast into the corpus-side filter
    val qTerms = queries
      .select(col("query_id"), explode(words(col("query_text"))).as("t"))
      .distinct()

    // postings of probed terms only: explode → semi-join-style filter
    // on the broadcast term set → tf aggregation over the survivors.
    // The doc length rides the postings (constant per doc, max() in
    // the map-side-combinable agg) so NOTHING downstream ever joins
    // back to a full-corpus relation — only probed postings shuffle.
    val termSet = qTerms.select(col("t")).distinct()
    val tf = docLen
      .select(col("doc_id"), size(col("ws")).as("dl"), explode(col("ws")).as("t"))
      .join(broadcast(termSet), Seq("t"))
      .groupBy(col("t"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

    // document frequency per probed term: a map-side-combinable
    // aggregation over the postings, broadcast back (one row per
    // probed term). The tf subtree recomputes for the broadcast side
    // — the deliberate trade: caching the postings measured 3.5×
    // slower (columnar build), and a count() WINDOW over `t` would
    // buffer a hot term's ENTIRE posting list in one task (a
    // stopword's list is corpus-sized — a straggler/OOM at scale);
    // two embarrassingly-parallel corpus passes have neither failure
    // mode.
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))

    // per-(query, doc, term) contribution — doubles from exact ints,
    // 6dp-rounded, micro-quantized so the sum is exact
    val contrib = tf
      .join(broadcast(qTerms), Seq("t"))
      .join(broadcast(df), Seq("t"))
      .crossJoin(broadcast(totals))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("w_micro", round(round(col("w"), 6) * lit(1e6)).cast("long"))

    val scored = contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w_micro")).as("score_micro"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    val out = scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("doc_id"), col("score_micro"),
        (col("score_micro").cast("double") / lit(1e6)).as("score"))
    val materialized = out.localCheckpoint(eager = true)
    docLen.unpersist()
    materialized
  }

  /** TF-IDF keyword extraction: the top-`k` most characteristic terms
    * of every document, scored with the sklearn-style smooth idf
    *
    *   tfidf(t, d) = tf(t, d) · ln((1 + N) / (1 + df(t)))
    *
    * — the per-document summary a corpus-curation pass uses for topic
    * tagging, near-dup triage, and mixture design.
    *
    * Execution shape: one tokenize → two map-side-combinable
    * aggregations (tf over (doc, term), df over term) → a shuffle
    * join on term → a per-document top-k window. The term join is the
    * only full shuffle and it moves one row per DISTINCT (doc, term),
    * never the raw token stream; the window partitions by doc_id, so
    * no task ever buffers more than one document's term set.
    *
    * Engine parity (the [[bm25TopK]] regime): idf is 6dp-rounded and
    * micro-quantized; `score_micro = tf · idf_micro` is then exact
    * BIGINT arithmetic, so scores and the (score desc, term asc)
    * ranking are bit-identical in any engine. Token-less documents
    * emit no rows (they have no terms to rank).
    *
    * Output: (doc_id, rank, term, tf, df, score_micro, tfidf).
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import TextDedup.words
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val totals = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("idf_micro",
        round(round(log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))), 6)
          * lit(1e6)).cast("long"))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("int").as("rank"),
        col("term"), col("tf"), col("df"), col("score_micro"),
        (col("score_micro").cast("double") / lit(1e6)).as("tfidf"))
  }

  /** Reciprocal-rank fusion of ranked retrieval lists (Cormack et al.
    * 2009): each list contributes 1/(kRrf + rank) per (query, doc);
    * the fused ranking orders by the summed contribution.
    *
    * Every input in `lists` is a (query_id, doc_id, rank) relation —
    * typically one lexical (BM25) and one dense (cosine ANN) list.
    * Contributions are EXACT integers (`1000000 div (kRrf + rank)`,
    * floor division on BIGINTs), so the fused score is an
    * order-independent BIGINT sum and the (score desc, doc_id)
    * ranking is bit-identical in any engine — no float summation.
    *
    * Scale shape: inputs are already top-k lists (k rows per query),
    * so the fuse is a groupBy over |queries|·k·|lists| rows — the
    * retrieval passes upstream do the heavy lifting; fusion itself
    * never touches the corpus.
    *
    * Output: (query_id, rank, doc_id, rrf_micro, n_lists).
    */
  def rrfFuse(lists: Seq[DataFrame], topK: Int, kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val contrib = lists
      .map(_.select(col("query_id"), col("doc_id"),
        expr(s"1000000L div (${kRrf}L + rank)").as("c")))
      .reduce(_.unionByName(_))
    val fused = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("rrf_micro"),
        count(lit(1)).cast("int").as("n_lists"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("doc_id"), col("rrf_micro"), col("n_lists"))
  }
}
