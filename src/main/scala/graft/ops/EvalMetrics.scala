package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation metrics for generation pipelines. Everything is exact
  * integer arithmetic (micro-units where a ratio is reported) so any
  * engine reproduces the numbers bit-for-bit — the same discipline
  * as the rest of the oracle surface.
  */
object EvalMetrics {

  /** Unbiased pass@k (Chen et al. 2021, the HumanEval estimator):
    * for a task with n samples of which c passed,
    * pass@k = 1 − C(n−c, k)/C(n, k), computed as the exact rational
    * Π_{i<k}(n−c−i) / Π_{i<k}(n−i) in BigInt and floored to
    * micro-units — no float raggedness, no lgamma approximation.
    *
    * Input: one row per sample with (idCol, passedCol). Scale shape:
    * ONE groupBy on the task key reduces samples to (n, c); the per-k
    * combinatorics run over the task-count-sized table in a typed
    * map. Output: (task_id, k, n, c, pass_micro).
    */
  def passAtK(samples: DataFrame, ks: Seq[Int], idCol: String = "task_id",
      passedCol: String = "passed"): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1: $ks")
    val spark = samples.sparkSession
    import spark.implicits._
    val agg = samples.groupBy(col(idCol).cast("long").as("task_id"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col(passedCol), 1L).otherwise(0L)).cast("long").as("c"))
      .as[(Long, Long, Long)]
    val ksB = ks.toArray
    agg.flatMap { case (task, n, c) =>
      ksB.iterator.filter(_ <= n).map { k =>
        val micro =
          if (n - c < k) 1000000L // fewer failures than k ⇒ certain pass
          else {
            var num = BigInt(1); var den = BigInt(1)
            var i = 0L
            while (i < k) { num *= BigInt(n - c - i); den *= BigInt(n - i); i += 1 }
            ((den - num) * 1000000 / den).toLong
          }
        (task, k, n, c, micro)
      }
    }.toDF("task_id", "k", "n", "c", "pass_micro")
  }

  /** BLEU sufficient statistics (Papineni et al. 2002 / sacrebleu's
    * per-segment stats): for each (candidate, reference) pair and
    * each n ≤ maxN, the CLIPPED n-gram match count
    * Σ_g min(count_cand(g), count_ref(g)), the candidate n-gram
    * total, and both lengths — all exact integers. Corpus BLEU is a
    * driver-side fold over these (sum the stats, then the one
    * geometric mean + brevity penalty at the very end), which is
    * exactly how distributed eval harnesses aggregate it; emitting
    * the stats rather than a per-pair float keeps the surface
    * bit-reproducible.
    *
    * Scale shape: one typed per-row kernel (two token maps per pair,
    * no joins, no shuffles); output is pairs × maxN rows.
    */
  def bleuStats(pairs: DataFrame, maxN: Int = 4, idCol: String = "pair_id",
      candCol: String = "candidate", refCol: String = "reference"): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col(idCol).cast("long"), col(candCol), col(refCol))
      .as[(Long, String, String)]
      .flatMap { case (id, cand, ref) =>
        val cw = Option(cand).getOrElse("").split(' ').filter(_.nonEmpty)
        val rw = Option(ref).getOrElse("").split(' ').filter(_.nonEmpty)
        (1 to maxN).map { n =>
          def grams(ws: Array[String]): java.util.HashMap[String, Long] = {
            val m = new java.util.HashMap[String, Long]()
            var i = 0
            while (i + n <= ws.length) {
              m.merge(ws.slice(i, i + n).mkString(" "), 1L, (a, b) => a + b)
              i += 1
            }
            m
          }
          val cg = grams(cw); val rg = grams(rw)
          var matches = 0L
          val it = cg.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val rc = rg.get(e.getKey)
            if (rc != null) matches += math.min(e.getValue, rc.longValue())
          }
          (id, n, matches, math.max(0, cw.length - n + 1).toLong,
            cw.length.toLong, rw.length.toLong)
        }
      }.toDF("pair_id", "n", "matches", "total", "cand_len", "ref_len")
  }

  /** chrF sufficient statistics (Popović 2015): per pair and per
    * character-n-gram order n ≤ maxN, the clipped match count plus
    * BOTH totals — chrF needs precision AND recall, so unlike BLEU
    * the reference total ships too. Whitespace is removed before
    * gramming (the chrF convention). Exact integers; the F-score
    * fold happens driver-side after summation, same contract as
    * [[bleuStats]]. Pure per-row kernel, zero shuffles.
    */
  def chrfStats(pairs: DataFrame, maxN: Int = 6, idCol: String = "pair_id",
      candCol: String = "candidate", refCol: String = "reference"): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col(idCol).cast("long"), col(candCol), col(refCol))
      .as[(Long, String, String)]
      .flatMap { case (id, cand, ref) =>
        val cs = Option(cand).getOrElse("").filterNot(_ == ' ')
        val rs = Option(ref).getOrElse("").filterNot(_ == ' ')
        (1 to maxN).map { n =>
          def grams(s: String): java.util.HashMap[String, Long] = {
            val m = new java.util.HashMap[String, Long]()
            var i = 0
            while (i + n <= s.length) {
              m.merge(s.substring(i, i + n), 1L, (a, b) => a + b)
              i += 1
            }
            m
          }
          val cg = grams(cs); val rg = grams(rs)
          var matches = 0L
          val it = cg.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val rc = rg.get(e.getKey)
            if (rc != null) matches += math.min(e.getValue, rc.longValue())
          }
          (id, n, matches, math.max(0, cs.length - n + 1).toLong,
            math.max(0, rs.length - n + 1).toLong)
        }
      }.toDF("pair_id", "n", "matches", "cand_total", "ref_total")
  }

  /** SQuAD-style token F1 + exact match per pair: overlap = clipped
    * unigram intersection, F1 = 2·overlap/(len_c + len_r) floored to
    * micro-units (exact — the denominator is an integer, no p/r
    * float round trip), EM = whitespace-normalized token equality.
    * Both-empty pairs score 1 (the SQuAD convention), one-empty 0.
    * Pure per-row kernel, zero shuffles.
    */
  def tokenF1(pairs: DataFrame, idCol: String = "pair_id",
      candCol: String = "candidate", refCol: String = "reference"): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col(idCol).cast("long"), col(candCol), col(refCol))
      .as[(Long, String, String)]
      .map { case (id, cand, ref) =>
        val cw = Option(cand).getOrElse("").split(' ').filter(_.nonEmpty)
        val rw = Option(ref).getOrElse("").split(' ').filter(_.nonEmpty)
        val rc = new java.util.HashMap[String, Long]()
        rw.foreach(w => rc.merge(w, 1L, (a, b) => a + b))
        var overlap = 0L
        val cc = new java.util.HashMap[String, Long]()
        cw.foreach(w => cc.merge(w, 1L, (a, b) => a + b))
        val it = cc.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val r = rc.get(e.getKey)
          if (r != null) overlap += math.min(e.getValue, r.longValue())
        }
        val f1Micro =
          if (cw.isEmpty && rw.isEmpty) 1000000L
          else 2L * overlap * 1000000L / (cw.length + rw.length)
        (id, overlap, cw.length.toLong, rw.length.toLong, f1Micro,
          cw.sameElements(rw))
      }.toDF("pair_id", "overlap", "cand_len", "ref_len", "f1_micro", "exact_match")
  }

  /** Cohen's kappa for two annotators over categorical labels — the
    * agreement gate every preference/RLHF labeling pipeline runs
    * before trusting its raters. κ = (p_o − p_e)/(1 − p_e) computed
    * as the exact rational (agree·N − Σ_c n_a(c)·n_b(c)) /
    * (N² − Σ_c n_a(c)·n_b(c)) in BigInt, FLOOR-divided to
    * micro-units (floor, not truncate — κ can be negative and the
    * two roundings differ there).
    *
    * Scale shape: one full-row agreement aggregate + two
    * class-count aggregates joined on the (tiny) label domain.
    * Output: ONE row (n, agree, pe_num, kappa_micro).
    */
  def cohensKappa(ratings: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    val spark = ratings.sparkSession
    import spark.implicits._
    val base = ratings.select(col(aCol).cast("string").as("a"),
      col(bCol).cast("string").as("b"))
    val top = base.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
    val na = base.groupBy(col("a").as("cls")).agg(count(lit(1)).as("na"))
    val nb = base.groupBy(col("b").as("cls")).agg(count(lit(1)).as("nb"))
    val pe = na.join(nb, Seq("cls"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("pe_num"))
    top.crossJoin(pe).as[(Long, Long, Long)].map { case (n, agree, peNum) =>
      val num = BigInt(agree) * n - peNum
      val den = BigInt(n) * n - peNum
      def floorDiv(a: BigInt, b: BigInt): Long = {
        val q = a / b
        (if (a % b != 0 && (a.signum != b.signum)) q - 1 else q).toLong
      }
      val micro =
        if (den == 0) 1000000L // every rating in one class and all agree
        else floorDiv(num * 1000000, den)
      (n, agree, peNum, micro)
    }.toDF("n", "agree", "pe_num", "kappa_micro")
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) statistic with exact
    * mid-rank tie handling — the nonparametric A/B gate for quality
    * scores (is pipeline variant B's score distribution
    * stochastically larger?), complementing the chi-squared
    * categorical gate. Mid-ranks are exact in MILLI units
    * (rank_milli = 1000·cntBefore + 500·(cnt+1), integral always),
    * so U carries no float anywhere; consumers apply the normal
    * approximation driver-side if they want a p-value.
    *
    * Scale shape: ONE value-domain aggregation (scores are the
    * domain, not rows) + one window over the value domain for the
    * cumulative count — never a global row sort. Output one row:
    * (n_a, n_b, r_a_milli, u_a_milli, u_b_milli), with
    * U_a + U_b = 1000·n_a·n_b as the built-in invariant.
    */
  def mannWhitneyU(df: DataFrame, isACol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = df.select(col(isACol).cast("boolean").as("is_a"),
        col(scoreCol).cast("long").as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byVal
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("rank_milli",
        (col("cum") - col("cnt")) * 1000L + (col("cnt") + 1L) * 500L)
    ranked.agg(
        sum(col("cnt_a")).cast("bigint").as("n_a"),
        sum(col("cnt") - col("cnt_a")).cast("bigint").as("n_b"),
        sum(col("cnt_a") * col("rank_milli")).cast("bigint").as("r_a_milli"))
      .select(col("n_a"), col("n_b"), col("r_a_milli"),
        (col("r_a_milli") - col("n_a") * (col("n_a") + 1L) * 500L)
          .as("u_a_milli"))
      .withColumn("u_b_milli",
        col("n_a") * col("n_b") * 1000L - col("u_a_milli"))
  }

  /** ROUGE-L sufficient statistics — the summarization-eval staple
    * completing the family: per-pair word-level LCS length plus both
    * token counts as exact integers, with the β=1 F-measure floored
    * to micro-units (2·lcs·10⁶/(m+n) — an exact integer form, no
    * P/R float round trip; both-empty pairs score 10⁶, one-empty 0,
    * the tokenF1 conventions). Recall/precision reconstruct from
    * (lcs, ref_len, cand_len) downstream at any β.
    *
    * Kernel: classic two-row DP, O(m·n) time / O(min(m,n)) space per
    * pair, pure per-row inside `mapPartitions` — zero shuffles, and
    * the quadratic term is per-DOCUMENT (summary-eval pairs are
    * sentence/paragraph scale), never cross-row.
    */
  def rougeL(pairs: DataFrame, idCol: String = "pair_id",
      candCol: String = "candidate", refCol: String = "reference"): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col(idCol).cast("long"), col(candCol), col(refCol))
      .as[(Long, String, String)]
      .map { case (id, cand, ref) =>
        val cw = Option(cand).getOrElse("").split(' ').filter(_.nonEmpty)
        val rw = Option(ref).getOrElse("").split(' ').filter(_.nonEmpty)
        // keep the short side as the DP row
        val (a, b) = if (cw.length <= rw.length) (rw, cw) else (cw, rw)
        val n = b.length
        var prev = new Array[Long](n + 1)
        var cur = new Array[Long](n + 1)
        var i = 1
        while (i <= a.length) {
          val ai = a(i - 1)
          var j = 1
          while (j <= n) {
            cur(j) =
              if (ai == b(j - 1)) prev(j - 1) + 1L
              else math.max(prev(j), cur(j - 1))
            j += 1
          }
          val t = prev; prev = cur; cur = t
          java.util.Arrays.fill(cur, 0L)
          i += 1
        }
        val lcs = prev(n)
        val f1Micro =
          if (cw.isEmpty && rw.isEmpty) 1000000L
          else if (cw.isEmpty || rw.isEmpty) 0L
          else 2L * lcs * 1000000L / (cw.length + rw.length)
        (id, lcs, cw.length.toLong, rw.length.toLong, f1Micro)
      }.toDF("pair_id", "lcs", "cand_len", "ref_len", "f1_micro")
  }
}
