package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: per-document
  * statistics / quality scoring, n-gram-lexicon language ID, token
  * counting (whitespace + BPE-ish regex), and bag-of-words document
  * fingerprinting. Everything is built from codegen'd built-ins so
  * the hot path stays inside whole-stage codegen; ratios are emitted
  * as raw doubles from exact integer counts (bit-identical across
  * engines).
  */
object TextStats {

  import TextDedup.words

  /** Per-doc stats: token counts, distinct tokens, char sums,
    * type-token ratio, average word length, and a deterministic
    * quality score combining them.
    */
  def stats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // split once; the tokenization lambda is the expensive part
    docs.select(col(idCol).as("doc_id"), words(col(textCol)).as("ws"))
      .select(
        col("doc_id"),
        size(col("ws")).as("n_words"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        aggregate(col("ws"), lit(0), (acc, w) => acc + length(w)).as("sum_word_len"))
      .withColumn("avg_word_len", col("sum_word_len").cast("double") / col("n_words"))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_words"))
      .withColumn("quality_score",
        col("ttr") * (least(col("n_words"), lit(100)).cast("double") / 100.0))
  }

  /** Stopword lexicons for the heuristic language classifier. Order
    * fixes the argmax tiebreak.
    */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "en" -> Seq("the", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "wo3", "you3"))

  /** Count of tokens of `text` that appear in `lex` (with multiplicity). */
  def lexiconHits(text: Column, lex: Seq[String]): Column =
    size(filter(words(text), w => w.isInCollection(lex)))

  /** Heuristic language ID: per-language stopword-hit scores, argmax
    * with first-in-`lexicons`-order tiebreak, "und" (undetermined)
    * when no lexicon hits at all. The text splits once; each lexicon
    * scores over the shared token array.
    */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withWs = docs.withColumn("_ws", words(col(textCol)))
    val scored = lexicons.foldLeft(withWs) { case (d, (lang, lex)) =>
      d.withColumn(s"score_$lang", size(filter(col("_ws"), w => w.isInCollection(lex))))
    }.drop("_ws")
    val maxScore = greatest(lexicons.map { case (l, _) => col(s"score_$l") }: _*)
    val predicted = lexicons.foldRight(lit("und")) { case ((lang, _), els) =>
      when(col(s"score_$lang") === maxScore && maxScore > 0, lang).otherwise(els)
    }
    // foldRight keeps lexicon order precedence: de wins ties over en, etc.
    scored.withColumn("predicted_lang", predicted)
  }

  /** Token counts: whitespace tokens and BPE-ish regex tokens
    * (runs of lowercase letters or digits over the lowercased text).
    */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(words(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z]+|[0-9]+"), lit(0))).as("re_tokens"))

  /** Canonical bag-of-words fingerprint: md5 of the sorted distinct
    * token list — documents that are permutations/repetitions of the
    * same vocabulary collide, giving cheap near-dup clusters.
    */
  /** PII scrub: redact emails and phone-shaped tokens with typed
    * placeholders and count what was removed. Patterns stay in the
    * common Java-regex/RE2 subset (no backrefs, no lookaround) so a
    * SQL oracle replays them verbatim; all codegen'd built-ins.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}-\\d{4}\\b"

  def redactPii(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      regexp_count(col(textCol), lit(EmailPattern)).as("n_emails"),
      regexp_count(col(textCol), lit(PhonePattern)).as("n_phones"),
      regexp_replace(regexp_replace(col(textCol), lit(EmailPattern), lit("<EMAIL>")),
        lit(PhonePattern), lit("<PHONE>")).as("redacted"))

  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(text)))))
}
