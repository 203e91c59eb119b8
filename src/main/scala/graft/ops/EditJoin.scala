package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — all pairs within Levenshtein
  * distance `d` — via PassJoin-style segment filtering (Li/Deng/Feng,
  * ICDE 2011 family), the fuzzy-dedup primitive for titles, URLs and
  * near-identical boilerplate prefixes.
  *
  * Never enumerates the corpus cross product. Pigeonhole: split every
  * string into d+1 segments; if ed(s,t) ≤ d then t contains at least
  * one segment of s VERBATIM, starting within ±d of the segment's
  * position in s (at most d edits each shift alignment by ≤ 1). So:
  *
  *  - **index side**: each string emits its d+1 segments, keyed by
  *    (slot, segment, source length) — d+1 rows per string;
  *  - **probe side**: each string emits, for every compatible source
  *    length L' (|L'−len| ≤ d) and slot, its substrings of the
  *    segment's length at positions within the ±d window — O(d²·(d+1))
  *    short rows per string, constant in corpus size;
  *  - equi-join on (slot, segment, L') → candidate id pairs (every
  *    true pair is a candidate, by the lemma); distinct; then one
  *    exact `levenshtein` verify over candidates only.
  *
  * Both generation passes are linear, the join keys are short
  * substrings, and the verify touches candidates only — the ED-join
  * shape that survives 100 TB, vs the O(n²) `ON levenshtein(a,b) <= d`
  * the oracle runs.
  *
  * Strings shorter than d+1 characters can't be segmented (and can
  * match with zero common characters, e.g. ed("ab","xy")=2); any
  * partner within distance d is then itself ≤ 2d chars, so these
  * degenerate shorts pair through a separate equi-join on an
  * enumerated length key — no cartesian anywhere in the plan.
  */
object EditJoin {

  /** Segment (start, length) bounds: first m−r segments of ⌊L/m⌋
    * chars, last r of ⌈L/m⌉, r = L mod m.
    */
  private[ops] def segBounds(len: Int, m: Int): Array[(Int, Int)] = {
    val base = len / m
    val r = len % m
    val out = new Array[(Int, Int)](m)
    var pos = 0
    var i = 0
    while (i < m) {
      val L = if (i < m - r) base else base + 1
      out(i) = (pos, L)
      pos += L
      i += 1
    }
    out
  }

  /** All (a_id, b_id, dist) with a_id < b_id and
    * levenshtein(key_a, key_b) ≤ d over `keyExpr` of `df`.
    * Output columns: (a_id, b_id, dist: long), ordered.
    */
  def editJoin(df: DataFrame, keyExpr: org.apache.spark.sql.Column,
      idCol: String = "doc_id", d: Int = 2): DataFrame = {
    require(d >= 1, s"edit distance threshold must be >= 1, got $d")
    val spark = df.sparkSession
    import spark.implicits._
    val m = d + 1

    val keyed = df.select(col(idCol).cast("long").as("id"),
      keyExpr.cast("string").as("k"))
    val ks = keyed.as[(Long, String)]

    // Index: (slot, segment, srcLen) per string with len >= m.
    val segs = ks.flatMap { case (id, k) =>
      if (k == null || k.length < m) Iterator.empty
      else segBounds(k.length, m).iterator.zipWithIndex.map {
        case ((pos, len), slot) => (slot, k.substring(pos, pos + len), k.length, id)
      }
    }.toDF("slot", "piece", "src_len", "a_id")

    // Probe: substrings at window positions for each compatible
    // source length; deduped per (slot, piece, src_len) per string.
    val dd = d
    val subs = ks.flatMap { case (id, k) =>
      if (k == null) Iterator.empty
      else {
        val T = k.length
        val out = scala.collection.mutable.HashSet.empty[(Int, String, Int)]
        var l2 = math.max(m, T - dd)
        while (l2 <= T + dd) {
          val bounds = segBounds(l2, m)
          var slot = 0
          while (slot < m) {
            val (pos, len) = bounds(slot)
            var q = math.max(0, pos - dd)
            val qMax = math.min(T - len, pos + dd)
            while (q <= qMax) {
              out += ((slot, k.substring(q, q + len), l2))
              q += 1
            }
            slot += 1
          }
          l2 += 1
        }
        out.iterator.map { case (slot, piece, srcLen) => (slot, piece, srcLen, id) }
      }
    }.toDF("slot", "piece", "src_len", "b_id")

    val mainCands = segs.join(subs, Seq("slot", "piece", "src_len"))
      .where(col("a_id") =!= col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))

    // Degenerate shorts (len <= d): enumerate partner lengths as an
    // equi-join key, so the plan stays a hash join.
    val shorts = keyed.where(length(col("k")) <= d)
    val shortLeft = shorts.select(col("id").as("a_id"),
      length(col("k")).as("len_key"))
    val shortRight = shorts.as[(Long, String)].flatMap { case (id, k) =>
      val T = k.length
      (math.max(0, T - dd) to (T + dd)).iterator.map(l => (id, l))
    }.toDF("b_id", "len_key")
    val shortCands = shortLeft.join(shortRight, "len_key")
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))

    val cands = mainCands.union(shortCands).distinct()

    // Verify candidates only, with one prefix-projection join per side.
    val ka = keyed.select(col("id").as("a_id"), col("k").as("ka"))
    val kb = keyed.select(col("id").as("b_id"), col("k").as("kb"))
    // thresholded built-in (Spark 3.5+): banded DP with early abort —
    // O(d·len) per candidate instead of O(len²), returns -1 past d
    cands.join(ka, "a_id").join(kb, "b_id")
      .withColumn("dist", levenshtein(col("ka"), col("kb"), d).cast("long"))
      .where(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("dist"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
