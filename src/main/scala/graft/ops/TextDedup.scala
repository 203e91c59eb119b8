package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Document-deduplication operators for large-scale training-data
  * pipelines: exact (hash groupBy), word-shingle exact Jaccard,
  * MinHash+LSH banding, and SimHash — all pure DataFrame transforms
  * that shuffle on content-derived keys, so they scale horizontally:
  * nothing is collected to the driver and every join key (hash,
  * shingle, band bucket) is high-cardinality.
  *
  * Reference behavior surface: the engine's north-star LLM-pipeline
  * extension (SURVEY.md §2.7 last row).
  */
object TextDedup {

  /** Non-empty whitespace tokens of `text`. */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Distinct word k-shingles ("w1 w2 w3") of `text`. Documents with
    * fewer than k words produce an empty set.
    */
  def wordShingles(text: Column, k: Int = 3): Column = {
    val ws = words(text)
    array_distinct(
      when(size(ws) >= k,
        transform(sequence(lit(0), size(ws) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(ws, (i + j + 1).cast("int"))): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** Exact dedup: group identical texts by md5, keep the smallest id
    * as the canonical representative. One shuffle on the hash key.
    *
    * Output: (text_hash, n_copies, keeper_id).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))

  /** (doc_id, distinct-shingle-array) computed in a typed JVM kernel —
    * identical semantics to [[wordShingles]] (single-space split, drop
    * empties, k-grams joined by one space, distinct) but without the
    * per-position interpreted lambda chain.
    */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the typed kernel encodes ids as long — a silent cast would null
    // out string keys and collapse every doc into one
    val idType = docs.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$idCol must be a numeric id column, got $idType " +
        "(hash or zip string ids to longs first)")
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, shinglesOf(text, k)) })
      .toDF("doc_id", "sh")
  }

  /** Distinct word k-shingles of one document — the per-row kernel
    * behind [[shingleSets]], shared with the streaming operator.
    */
  private[graft] def shinglesOf(text: String, k: Int): Array[String] = {
    if (text == null) return Array.empty
    val ws = text.split(' ').filter(_.nonEmpty)
    if (ws.length < k) Array.empty
    else ws.sliding(k).map(_.mkString(" ")).toArray.distinct
  }

  /** (doc_id, shingle) exploded pairs, distinct per doc. */
  def explodedShingles(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    shingleSets(docs, idCol, textCol, k)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))

  /** (doc_id, ng) word k-gram rows WITH multiplicity — the
    * repetition-analysis counterpart of [[shingleSets]] (which
    * distincts): same tokenizer, same joining, emitted as a typed
    * flatMap so no per-position interpreted lambda chain runs.
    * Documents with fewer than k words emit nothing.
    */
  def ngramRows(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val idType = docs.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$idCol must be a numeric id column, got $idType")
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        // null text emits no rows, like the column-expression form
        // (words(null) -> null -> filtered) and the simHash kernel
        if (text == null) Iterator.empty
        else {
          val ws = text.split(' ').filter(_.nonEmpty)
          if (ws.length < k) Iterator.empty
          else ws.sliding(k).map(g => (id, g.mkString(" ")))
        }
      })
      .toDF("doc_id", "ng")
  }

  /** Exact pairwise Jaccard over word k-shingles, computed
    * relationally: explode shingles, self-join on the shingle key,
    * count intersections, then |A∪B| = |A|+|B|−|A∩B|. Only emits
    * pairs sharing ≥1 shingle, so the join prunes the O(n²) space to
    * co-occurring documents. For web-scale corpora use
    * `minHashNearDups` instead — this is the verify/oracle kernel.
    *
    * Output: (doc_a, doc_b, inter, size_a, size_b, jaccard) with
    * doc_a < doc_b.
    */
  def exactJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    val sh = explodedShingles(docs, idCol, textCol, k)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_shingles").as("size_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_shingles").as("size_b")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
  }

  /** MinHash signatures: one row per doc, `sig` = array of `numHashes`
    * minima over the doc's shingle hashes. The hash family is the
    * per-slot universal hash (a_k·x + b_k) mod 2³¹−1 over the md5-
    * derived base hash x (see [[signatureOfShingles]]) — 31-bit
    * values keep every product exact in BIGINT on any engine (a
    * DuckDB oracle replays the family verbatim; xxhash64 wrap-around
    * arithmetic could not be reproduced there). Computation is the
    * zero-shuffle per-doc kernel of [[signaturesFromSets]].
    */
  def minHashSignatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, numHashes: Int = 64): DataFrame =
    signaturesFromSets(shingleSets(docs, idCol, textCol, k), numHashes)

  /** Signatures straight from per-doc shingle sets: MinHash is
    * per-document state, so one typed pass over (doc_id, shingles)
    * computes every signature with ZERO shuffle — the exploded
    * relational form paid a full shingle-row shuffle into
    * reduceGroups for the same result. The hash family (md5 hex
    * prefix split into two 56-bit halves, Kirsch–Mitzenmacher slots)
    * is what the d42 oracle replays in SQL.
    */
  def signaturesFromSets(sets: DataFrame, numHashes: Int): DataFrame = {
    val spark = sets.sparkSession
    import spark.implicits._
    val n = numHashes
    // shingle-less docs had no exploded rows (hence no signature) in
    // the relational form; keep them out here too, or their all-MaxValue
    // signatures would band-collide with each other
    sets.filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh")).as[(Long, Array[String])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, shingles) => (id, signatureOfShingles(shingles, n, digest)) }
      }
      .toDF("doc_id", "sig")
  }

  /** Mersenne prime 2³¹−1: the minhash slot modulus. 31-bit values
    * keep `a·x + b` within 62 bits — exact in a BIGINT on any engine.
    */
  private[graft] val MinHashP = 2147483647L

  /** Per-slot universal-hash constants (a_k, b_k), derived from md5
    * of literal strings so any SQL engine regenerates them:
    * a_k = 1 + md5int14("mha:k") mod (p−1)  (never 0),
    * b_k =     md5int14("mhb:k") mod p.
    */
  private val minHashConstsCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private[graft] def minHashConsts(n: Int): (Array[Long], Array[Long]) =
    minHashConstsCache.computeIfAbsent(n, { nn =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      def md5int14(s: String): Long = {
        val d = digest.digest(s.getBytes("UTF-8"))
        var h = 0L; var i = 0
        while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        h
      }
      val a = Array.tabulate(nn)(k => 1L + md5int14(s"mha:$k") % (MinHashP - 1))
      val b = Array.tabulate(nn)(k => md5int14(s"mhb:$k") % MinHashP)
      (a, b)
    })

  /** MinHash signature of one shingle set — the per-row kernel behind
    * [[signaturesFromSets]], shared with the streaming operator.
    * Slot k minimizes the UNIVERSAL hash (a_k·x + b_k) mod 2³¹−1 over
    * x = (first 14 md5 hex chars of the shingle) mod 2³¹−1 — per-slot
    * independent constants, so slot agreements are ~independent
    * Bernoulli(J) draws and banded recall follows the textbook
    * 1−(1−J^r)^b. (The earlier h1 + k·h2 linear family made slots
    * heavily correlated: when the minimizing shingle differed between
    * two docs, whole runs of slots disagreed together — measured ~4%
    * missed pairs at J = 0.88 under 16×4 banding where independence
    * predicts ~3e-7.) All arithmetic stays exact in 62 bits, so the
    * d42 oracle replays it verbatim in SQL.
    */
  private[graft] def signatureOfShingles(shingles: Array[String], n: Int,
      digest: java.security.MessageDigest): Array[Long] = {
    val (as, bs) = minHashConsts(n)
    val sig = Array.fill(n)(Long.MaxValue)
    var si = 0
    while (si < shingles.length) {
      val d = digest.digest(shingles(si).getBytes("UTF-8"))
      var h1 = 0L
      var bi = 0
      while (bi < 7) { h1 = (h1 << 8) | (d(bi) & 0xffL); bi += 1 }
      val x = h1 % MinHashP
      var i = 0
      while (i < n) {
        val h = (as(i) * x + bs(i)) % MinHashP
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      si += 1
    }
    sig
  }

  /** LSH banding over MinHash signatures: hash each band of
    * `rowsPerBand` signature slots, emit (band, bucket) keys, and
    * self-join within buckets. Candidates ≪ n² and the join key is a
    * 64-bit band hash, so bucket skew USUALLY stays bounded at scale —
    * but a boilerplate-heavy corpus can drop half its documents into
    * one band bucket, and the self-join then enumerates all B²/2
    * pairs of that bucket in a single task.
    *
    * `hotBucketThreshold > 0` arms the skew path: bucket sizes are
    * counted first (one aggregation over the banded rows — the
    * threshold is explicit because of exactly this extra pass),
    * buckets above the threshold route to a salted group-pair
    * self-join —
    * each doc gets a deterministic salt s ∈ [0, saltGroups) and is
    * replicated to the task keys (lo, hi) = (min(s,j), max(s,j)) for
    * every j, so a hot bucket's pair space splits into
    * g(g+1)/2 independently-scheduled tasks of (2B/g)² work; the
    * `least/greatest` equality in the join condition makes every pair
    * land in EXACTLY one task (the (s_a, s_b) one), so no dedup
    * beyond the final `distinct` is needed. Cold buckets keep the
    * plain one-key join.
    *
    * `hotBucketThreshold < 0` is AUTO: one metadata-sized stats job
    * over the bucket counts (max bucket size + total banded rows land
    * on the driver, nothing else) derives the threshold
    * `max(64, ⌈√(2n)⌉)` — a bucket is hot when its self-join pair
    * work b²/2 rivals the n-row linear work of the whole banding
    * stage, the point where one task's quadratic work dominates an
    * otherwise-linear plan. (An avg-bucket-size rule fails here: the
    * skew being detected inflates the average.) A flat corpus pays
    * the one stats aggregation and keeps the plain single-join plan
    * (no routing join, no replication); a boilerplate-skewed corpus
    * arms without anyone having to know its shape in advance.
    *
    * Output: distinct (doc_a, doc_b) candidate pairs, doc_a < doc_b —
    * identical across the plain, explicit and auto paths.
    */

  /** (doc_id, band, bucket) rows: bucket = xxhash64 of the band's
    * signature slots (equality ≡ slot-tuple equality up to 64-bit
    * collision). Shared by the self-join and cross-corpus LSH paths.
    */
  private def bandedRows(sig: DataFrame, numBands: Int,
      rowsPerBand: Int): DataFrame =
    sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r => element_at(col("sig"), (b * lit(rowsPerBand) + r + 1).cast("int"))): _*))))
        .as(Seq("band", "bucket")))

  def lshCandidates(sig: DataFrame, numBands: Int = 16, rowsPerBand: Int = 4,
      hotBucketThreshold: Int = 0, saltGroups: Int = 8): DataFrame =
    lshCandidatesWithDecision(sig, numBands, rowsPerBand, hotBucketThreshold,
      saltGroups)._1

  /** [[lshCandidates]] plus whether the salted hot-bucket path armed.
    * The arming decision rides in the return value — no shared
    * mutable state, so concurrent callers in one session each see
    * their own call's decision. (The armed result is
    * localCheckpoint'ed to free the banded cache, which erases the
    * logical plan a caller could otherwise inspect — hence the
    * explicit flag.)
    */
  def lshCandidatesWithDecision(sig: DataFrame, numBands: Int = 16,
      rowsPerBand: Int = 4, hotBucketThreshold: Int = 0,
      saltGroups: Int = 8): (DataFrame, Boolean) = {
    var saltedArmed = false
    val bandedRaw = bandedRows(sig, numBands, rowsPerBand)
    // the skew machinery (auto stats job, hot-list scan, salted join)
    // reads the banded rows 2-3 times; persist so the signature kernel
    // runs once. The plain path self-joins with matching partitioning,
    // which Catalyst already serves via ReusedExchange — no cache there.
    val banded = if (hotBucketThreshold != 0)
      bandedRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else bandedRaw
    def pairJoin(b: DataFrame): DataFrame =
      b.as("x")
        .join(b.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    def saltedPlan(threshold: Long): DataFrame = {
        saltedArmed = true
        val g = saltGroups
        // hot-bucket list is tiny by construction (corpus_rows/threshold
        // buckets at most) — broadcast it as the routing filter
        val hot = broadcast(
          banded.groupBy(col("band"), col("bucket"))
            .agg(count(lit(1)).as("_n"))
            .filter(col("_n") > threshold)
            .select(col("band"), col("bucket"), lit(true).as("_hot")))
        val tagged = banded.join(hot, Seq("band", "bucket"), "left")
        val cold = pairJoin(tagged.filter(col("_hot").isNull).drop("_hot"))
        val hotDocs = tagged.filter(col("_hot") === true).drop("_hot")
        // First-band ownership for identical-membership hot pairs
        // (r13, VERDICT item 2): a boilerplate clique's docs share
        // identical signatures, so every band's bucket is the SAME hot
        // group and each clique pair was enumerated AND emitted once
        // per band — numBands× duplicate rows into the pair distinct's
        // exchange, the largest remaining shuffle of the skew path.
        // Each hot doc gets an EXACT group id: gid = min doc_id over
        // its full hot (band, bucket) membership array (a groupBy on
        // the array itself — no hashes, so gid equality ⟺ membership
        // equality), plus mb = its first hot band. A hot pair whose
        // two docs have the SAME gid (⟹ identical hot memberships,
        // the clique case) is emitted ONLY from band mb; every other
        // hot pair emits as before (once per shared hot band — rare
        // for differing signatures) and the trailing distinct still
        // collapses those. Exactness: same-gid docs share band mb by
        // definition, and the join's residual `x.band === x.mb ||
        // x.gid =!= y.gid` is true there (gid equality implies equal
        // mb), so every suppressed pair still emits exactly once. The
        // residual is two primitive comparisons — whole-stage-codegen,
        // ~free at the 10⁷–10⁸ enumerations the salted join performs
        // (a first cut with filter()/arrays_overlap() higher-order
        // functions was interpreted per enumeration and REGRESSED the
        // skew rehearsal 37→67 s; guide §"expressions and codegen").
        // The salted task routing (s, lo, hi) is untouched: the skew
        // machinery still arms, replicates and schedules exactly as
        // before; only duplicate EMISSIONS are suppressed. The gid
        // derivation reads hot rows only (hot-membership sized), never
        // the full banded table.
        val perHotDoc = hotDocs.groupBy(col("doc_id"))
          .agg(array_sort(collect_list(struct(col("band"), col("bucket")))).as("hb"),
            min(col("band")).as("mb"))
        val gids = perHotDoc.groupBy(col("hb")).agg(min(col("doc_id")).as("gid"))
        val docGid = perHotDoc.join(gids, "hb")
          .select(col("doc_id"), col("mb"), col("gid"))
        val salted = hotDocs
          .join(docGid, Seq("doc_id"))
          .withColumn("s", pmod(xxhash64(col("doc_id")), lit(g.toLong)).cast("int"))
          .withColumn("j", explode(sequence(lit(0), lit(g - 1))))
          .withColumn("lo", least(col("s"), col("j")))
          .withColumn("hi", greatest(col("s"), col("j")))
          .drop("j")
        val hotPairs = salted.as("x")
          .join(salted.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
              col("x.lo") === col("y.lo") && col("x.hi") === col("y.hi") &&
              col("x.doc_id") < col("y.doc_id") &&
              least(col("x.s"), col("y.s")) === col("x.lo") &&
              greatest(col("x.s"), col("y.s")) === col("x.hi") &&
              (col("x.band") === col("x.mb") || col("x.gid") =!= col("y.gid")))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        cold.union(hotPairs)
    }
    val pairs =
      if (hotBucketThreshold == 0) pairJoin(banded)
      else if (hotBucketThreshold > 0) saltedPlan(hotBucketThreshold.toLong)
      else {
        // AUTO: the stats job ships exactly two numbers to the driver
        val st = banded.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("_n"))
          .agg(max(col("_n")).as("mx"), sum(col("_n")).as("n")).head()
        if (st.isNullAt(0)) pairJoin(banded) // empty corpus
        else {
          val t = math.max(64L, math.ceil(math.sqrt(2.0 * st.getLong(1))).toLong)
          if (st.getLong(0) <= t) pairJoin(banded) else saltedPlan(t)
        }
      }
    val out = pairs.distinct()
    // opt-in pre-checkpoint plan dump (evidence/debugging): the eager
    // localCheckpoint below truncates the plan to a LogicalRDD, so
    // this is the only place the salted/plain shape is inspectable
    if (sys.env.contains("GRAFT_LSH_EXPLAIN")) out.explain("formatted")
    val result = if (hotBucketThreshold != 0) {
      // candidate pairs are tiny next to the banded cache they free —
      // the minHashNearDups localCheckpoint-then-unpersist pattern
      val cp = out.localCheckpoint(eager = true)
      banded.unpersist()
      cp
    } else out
    (result, saltedArmed)
  }

  /** MinHash+LSH near-dup detection end-to-end: signatures → banded
    * candidate pairs → exact-Jaccard verification on the candidates
    * only (per-pair `array_intersect` on the two shingle sets — no
    * quadratic stage anywhere).
    *
    * Output: (doc_a, doc_b, jaccard) for verified pairs.
    */
  def minHashNearDups(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, numHashes: Int = 64,
      numBands: Int = 16, minJaccard: Double = 0.5,
      hotBucketThreshold: Int = 0, saltGroups: Int = 8): DataFrame =
    minHashNearDupsWithDecision(docs, idCol, textCol, k, numHashes,
      numBands, minJaccard, hotBucketThreshold, saltGroups)._1

  /** [[minHashNearDups]] plus whether the salted hot-bucket path armed
    * (the [[lshCandidatesWithDecision]] flag, threaded through the
    * verify stage) — lets rehearsals/specs assert the skew machinery
    * actually fired on a corpus built to trip it.
    */
  def minHashNearDupsWithDecision(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, numHashes: Int = 64,
      numBands: Int = 16, minJaccard: Double = 0.5,
      hotBucketThreshold: Int = 0, saltGroups: Int = 8): (DataFrame, Boolean) = {
    // tokenize once: shingle sets persist; signatures, candidates and
    // the verify join all reuse them
    val sets = shingleSets(docs, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (cands, armed) = lshCandidatesWithDecision(signaturesFromSets(sets, numHashes),
      numBands, numHashes / numBands, hotBucketThreshold, saltGroups)
    // Exact-duplicate collapse for the VERIFY stage (r12, after the
    // r11 skew rehearsal's IO sensitivity attributed to this join):
    // docs with IDENTICAL shingle sets — boilerplate cliques, web
    // corpora's dominant skew — share one representative (min doc_id
    // over the set-equality class), so per-pair `array_intersect`
    // ships arrays once per DISTINCT REPRESENTATIVE PAIR instead of
    // once per doc pair. A B-doc identical clique costs O(B) narrow
    // rows here instead of O(B²)·|set| shuffle bytes; at 100× corpus
    // scale the latter is the plan-killer. Output is UNCHANGED:
    // same-rep pairs have jaccard exactly 1.0 (identical nonempty
    // sets), cross-rep pairs take their rep pair's verified jaccard
    // (equal sets ⇒ equal jaccard), and pairs of empty sets drop in
    // both shapes (0/0 was never >= a positive threshold).
    // r12 optimization-round shape: one groupBy on the shingle array
    // replaces the former window-over-`sh` + doc_id re-join — the
    // window buffered every hot set-equality class's ARRAY rows in
    // WindowExec and the repSets join paid a second full array
    // exchange (by doc_id); the aggregate form partial-aggregates
    // map-side, carries (sh, rep) once per DISTINCT set, and repSets
    // falls out of the same aggregate for free (guide §2.3/§2.4).
    // Row-identical: rep = min doc_id over the set-equality class
    // either way, and each distinct sh yields exactly one rep row.
    val reps = sets.groupBy(col("sh")).agg(min(col("doc_id")).as("rep"))
    val members = sets.join(reps, "sh")
      .select(col("doc_id"), col("rep"), size(col("sh")).as("nsh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val repSets = reps.select(col("rep").as("doc_id"), col("sh"))
    val candsR = cands
      .join(members.select(col("doc_id").as("doc_a"), col("rep").as("rep_a"),
        col("nsh").as("nsh_a")), "doc_a")
      .join(members.select(col("doc_id").as("doc_b"), col("rep").as("rep_b")),
        "doc_b")
    val sameRep = candsR
      .filter(col("rep_a") === col("rep_b") && col("nsh_a") > 0)
      .select(col("doc_a"), col("doc_b"), lit(1.0).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
    val repPairs = candsR.filter(col("rep_a") =!= col("rep_b"))
      .select(least(col("rep_a"), col("rep_b")).as("ra"),
        greatest(col("rep_a"), col("rep_b")).as("rb"))
      .distinct()
    val repVerified = repPairs
      .join(repSets.select(col("doc_id").as("ra"), col("sh").as("sh_a")), "ra")
      .join(repSets.select(col("doc_id").as("rb"), col("sh").as("sh_b")), "rb")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("ra"), col("rb"), col("jaccard"))
    val crossRep = candsR.filter(col("rep_a") =!= col("rep_b"))
      .select(col("doc_a"), col("doc_b"),
        least(col("rep_a"), col("rep_b")).as("ra"),
        greatest(col("rep_a"), col("rep_b")).as("rb"))
      .join(repVerified, Seq("ra", "rb"))
      .select("doc_a", "doc_b", "jaccard")
    val out = sameRep.union(crossRep)
      // verified pairs only — tiny next to the shingle cache it frees
      .localCheckpoint(eager = true)
    members.unpersist()
    sets.unpersist()
    (out, armed)
  }

  /** Incremental (cross-corpus) near-dup screen: every NEW document
    * checked against an existing REFERENCE corpus — the pass a crawl
    * pipeline runs per snapshot, where the reference is everything
    * already accepted. Same MinHash/banding machinery as
    * [[minHashNearDups]], but the band-bucket join runs ACROSS the
    * two sides only: no reference self-pairs, no new self-pairs — at
    * snapshot scale the new side is ≪ the reference, and reference
    * signatures are computed once (persist them upstream in a real
    * deployment; they are id + 64 longs per doc).
    *
    * Output, one row per new doc: (doc_id, n_matches, best_ref_id,
    * best_jaccard, is_dup) — best by (jaccard desc, ref_id asc);
    * unmatched docs carry (0, −1, 0.0, false).
    */
  def crossCorpusNearDups(newDocs: DataFrame, refDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 3,
      numHashes: Int = 64, numBands: Int = 16,
      minJaccard: Double = 0.5): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val newSets = shingleSets(newDocs, idCol, textCol, k).persist(lvl)
    val refSets = shingleSets(refDocs, idCol, textCol, k).persist(lvl)
    val rows = numHashes / numBands
    val cands = bandedRows(signaturesFromSets(newSets, numHashes), numBands, rows).as("n")
      .join(bandedRows(signaturesFromSets(refSets, numHashes), numBands, rows).as("r"),
        col("n.band") === col("r.band") && col("n.bucket") === col("r.bucket"))
      .select(col("n.doc_id").as("new_id"), col("r.doc_id").as("ref_id"))
      .distinct()
    val verified = cands
      .join(newSets.select(col("doc_id").as("new_id"), col("sh").as("sh_n")), "new_id")
      .join(refSets.select(col("doc_id").as("ref_id"), col("sh").as("sh_r")), "ref_id")
      .withColumn("inter", size(array_intersect(col("sh_n"), col("sh_r"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_n")) + size(col("sh_r")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
    val best = verified.groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(struct(negate(col("jaccard")).as("nj"), col("ref_id").as("rid"))).as("b"))
      .select(col("new_id"), col("n_matches"),
        col("b.rid").as("best_ref_id"), negate(col("b.nj")).as("best_jaccard"))
    val out = newDocs.select(col(idCol).as("doc_id"))
      .join(best.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("best_ref_id"), lit(-1L)).as("best_ref_id"),
        coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
        (coalesce(col("n_matches"), lit(0L)) > 0).as("is_dup"))
      .localCheckpoint(eager = true)
    newSets.unpersist()
    refSets.unpersist()
    out
  }

  /** 60-bit SimHash over whitespace tokens. Token hashes come from the
    * md5 hex prefix (so any engine — including the DuckDB oracle — can
    * reproduce them), bit votes are ±1 per occurrence, and the final
    * fingerprint sets bit k iff the vote is positive.
    *
    * Output: (doc_id, simhash).
    */
  def simHash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      bits: Int = 60): DataFrame = {
    require(bits <= 60, s"simHash carries at most 60 md5-derived bits, got $bits")
    val spark = docs.sparkSession
    import spark.implicits._
    val idType = docs.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$idCol must be a numeric id column, got $idType")
    // SimHash is per-document state: one typed pass computes every
    // fingerprint with ZERO shuffle, where the relational form
    // (explode tokens → groupBy doc → 60 vote columns) shuffles every
    // token row. The token hash is the first 15 md5 hex chars as a
    // 60-bit integer — byte-identical to
    // conv(substring(md5(w),1,15),16,10), so SQL oracles replay it.
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        // token-less (or null-text) docs emit NO row — the relational
        // explode form produced no token rows for them, and the SQL
        // oracles' unnest CTE does the same; an all-zero fingerprint
        // would band-collide every empty doc with every other
        it.flatMap { case (id, text) =>
          if (text == null) None
          else {
            val votes = new Array[Int](bits)
            val ws = text.split(' ')
            var nTokens = 0
            var wi = 0
            while (wi < ws.length) {
              val w = ws(wi)
              if (w.nonEmpty) {
                nTokens += 1
                val d = digest.digest(w.getBytes("UTF-8"))
                // big-endian first 8 bytes >>> 4 == first 15 hex chars
                var h = 0L
                var bi = 0
                while (bi < 8) { h = (h << 8) | (d(bi) & 0xffL); bi += 1 }
                h = h >>> 4
                var k = 0
                while (k < bits) {
                  if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
                  k += 1
                }
              }
              wi += 1
            }
            if (nTokens == 0) None
            else {
              var sh = 0L
              var k = 0
              while (k < bits) { if (votes(k) > 0) sh |= (1L << k); k += 1 }
              Some((id, sh))
            }
          }
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Connected components over near-dup pairs — the clustering step
    * that turns pairwise matches into dedup groups with a canonical
    * (minimum-id) representative. Min-label propagation with pointer
    * jumping: each round every vertex takes the minimum of its own
    * label, its neighbors' labels, and its LABEL'S label
    * (`l(l(v))` — the path-halving step that makes chains converge in
    * O(log n) rounds instead of O(diameter)). Labels only decrease,
    * so the fixpoint is exactly the component minimum; the loop exits
    * when a round changes nothing. Edges stay static (no growing
    * intermediate edge sets), each round is three shuffles of the
    * label table, and no adjacency list is ever collected, so hub
    * vertices can't blow a task.
    *
    * Returns (doc_id, cluster_id) for every vertex in `vertices`,
    * cluster_id = min doc_id of the component (singletons map to
    * themselves).
    */
  /** The production near-dup CLUSTERING pipeline for boilerplate-heavy
    * corpora: exact-collapse FIRST, near-dup machinery on unique texts
    * only, clusters expanded back through exact-group membership.
    *
    * A clique of B byte-identical documents (license headers, crawl
    * templates) costs the direct LSH path C(B,2) candidate pairs
    * through verify and CC — the skew pathology `t_dedup200k_skew`
    * stresses. Collapsing by `md5(text)` first makes that clique ONE
    * representative: its C(B,2) internal pairs are never materialized
    * (membership in the exact group IS the edge set, implicitly), and
    * the hot bucket disappears before banding. The result partition is
    * provably identical to the direct path's: byte-identical docs have
    * identical shingle sets, hence identical signatures, buckets and
    * verified similarities, so collapsing them is quotienting the
    * similarity graph by a clique — connectivity is preserved, and
    * the component's min label is the min representative id, which is
    * the min doc id of the expanded cluster (reps are per-group min).
    *
    * Output: (doc_id, rep_id, cluster_id) for every input doc —
    * cluster_id = min doc id of its (exact ∪ near-dup) cluster.
    * Shuffle shape: one groupBy + one join on the text hash (both on
    * the 16-byte md5, never the text), then the rep-only LSH cascade.
    */
  def collapsedNearDupClusters(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, numHashes: Int = 64,
      numBands: Int = 16, minJaccard: Double = 0.5,
      hotBucketThreshold: Int = 0): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val hashed = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .withColumn("th", md5(col("text")))
      .persist(lvl)
    val reps = hashed.groupBy(col("th")).agg(min(col("doc_id")).as("rep_id"))
    val mem = hashed.select(col("doc_id"), col("th"))
      .join(reps, "th").select(col("doc_id"), col("rep_id"))
      .localCheckpoint(eager = true)
    val repDocs = hashed.join(reps, "th")
      .where(col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("text"))
    val pairs = minHashNearDups(repDocs, "doc_id", "text", k, numHashes,
      numBands, minJaccard, hotBucketThreshold)
    // rep-count-sized label table; checkpoint before the text cache
    // drops so the caller's action can't recompute the md5 scan
    val cc = connectedComponents(pairs, repDocs.select(col("doc_id")))
      .localCheckpoint(eager = true)
    hashed.unpersist()
    mem.join(cc.select(col("doc_id").as("rep_id"), col("cluster_id")), "rep_id")
      .select(col("doc_id"), col("rep_id"), col("cluster_id"))
  }

  def connectedComponents(pairs: DataFrame, vertices: DataFrame,
      maxRounds: Int = 60, localThreshold: Long = 5000000L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .distinct()
      .persist(lvl)

    val edgeCount = edges.count()
    // the union-find fast path narrows ids to long; non-numeric ids
    // (string keys) take the propagation path, which only compares
    val idsAreNumeric = edges.schema("u").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    // labels materialize (eager checkpoint) BEFORE edges unpersists —
    // otherwise the cached edge set built by count() is dropped while
    // the label pipeline is still lazy and the whole pair derivation
    // recomputes at the caller's action
    val rawLabels =
      if (edgeCount <= localThreshold && idsAreNumeric) ccUnionFind(edges)
      else ccPropagate(edges, maxRounds)
    val labels = rawLabels.select(col("id"), col("label")).localCheckpoint(eager = true)
    dropCheckpoint(rawLabels) // propagate path: free its final-round blocks
    val out = vertices.select(col("doc_id"))
      .join(labels.select(col("id").as("doc_id"), col("label")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
    edges.unpersist()
    out
  }

  /** Small-graph fast path: two-stage distributed union-find. Stage 1
    * runs a union-find per input partition IN PARALLEL, reducing each
    * partition's edges to at most |distinct vertices in partition|
    * spanning (vertex, root) pairs. Stage 2 merges the spanning
    * forests in one small task whose input is vertex-bounded, not
    * edge-bounded — so an edge-heavy graph near `localThreshold` no
    * longer serializes all the work into one straggler core. Both
    * stages use a primitive-specialized map ([[LongUnionFind]],
    * ~17 bytes/vertex), so even the 10M-vertex worst case at the 5M-
    * edge threshold sits around 230 MB of task heap, not multiple GB
    * of boxed entries. Runs on executors via mapPartitions — nothing
    * is collected to the driver. Min-root union keeps every root at
    * its component's minimum id.
    */
  private def ccUnionFind(edges: DataFrame): DataFrame = {
    val sess = edges.sparkSession
    import sess.implicits._
    edges.select(col("u").cast("long"), col("v").cast("long")).as[(Long, Long)]
      .mapPartitions(unionFindPairs) // parallel per-partition reduction
      // repartition (a SHUFFLE), not coalesce: a narrow coalesce(1)
      // would fuse stage 1 into the single merged task and run every
      // partition's union-find serially on one core — the shuffle
      // boundary is what makes the reduction actually parallel
      .repartition(1)
      .mapPartitions(unionFindPairs) // vertex-bounded forest merge
      .toDF("id", "label")
  }

  /** Union all (u, v) pairs, emit (vertex, component-min) for every
    * vertex seen. Composable: feeding one pass's output into another
    * merges the spanning forests.
    */
  private def unionFindPairs(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val uf = new LongUnionFind
    it.foreach { case (u, v) => uf.union(u, v) }
    uf.labels
  }

  /** Big-graph path: min-label propagation with pointer jumping,
    * O(log n) rounds, three bounded shuffles per round. Only vertices
    * that touch an edge participate.
    */
  /** Free the executor blocks behind a DataFrame that IS an eager
    * localCheckpoint — i.e. whose analyzed plan is the bare
    * `LogicalRDD` the checkpoint produced (Dataset.unpersist does not
    * reach those blocks; they live on the wrapped RDD, not in the
    * cache manager). Deliberately matches ONLY the top-level node and
    * never walks into plan leaves: a derived plan's leaves can include
    * checkpoints the CALLER owns (e.g. [[minHashNearDups]] output
    * passed in as `pairs`), and localCheckpoint truncates lineage, so
    * unpersisting a caller's checkpoint would make their DataFrame
    * permanently unrecomputable. No-op on non-checkpoint plans.
    */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Returns the final round's eager checkpoint directly (columns id,
    * label, prev) so the caller can [[dropCheckpoint]] it after
    * re-materializing — every intermediate round's checkpoint is
    * freed here as soon as the next round lands.
    */
  private def ccPropagate(edges: DataFrame, maxRounds: Int): DataFrame = {
    var ck = edges.select(col("u").as("id"))
      .distinct()
      .select(col("id"), col("id").as("label"), col("id").as("prev"))
      .localCheckpoint(eager = true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val labels = ck.select(col("id"), col("label"))
      // min over neighbors' labels
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "v").withColumnRenamed("label", "vlabel"), "v")
        .groupBy("u").agg(min("vlabel").as("nmin"))
        .withColumnRenamed("u", "id")
      // pointer jumping: the label of my label
      val jump = labels
        .join(labels.select(col("id").as("label"), col("label").as("jlabel")), "label")
        .select(col("id"), col("jlabel"))
      // localCheckpoint truncates the logical plan — without it each
      // round's plan nests the last round's, and Catalyst re-analysis
      // goes superlinear (then overflows) after a few iterations.
      // The previous label rides along so the convergence check is a
      // filter over the checkpointed result, not another join+shuffle.
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .join(jump, Seq("id"), "left")
        .select(col("id"), least(
          col("label"),
          coalesce(col("nmin"), col("label")),
          coalesce(col("jlabel"), col("label"))).as("label"),
          col("label").as("prev"))
        .localCheckpoint(eager = true)
      changed = next.filter(col("label") < col("prev")).count()
      // the superseded round's checkpoint blocks are dead the moment
      // `next` materializes — free them instead of letting up to
      // maxRounds copies of the label table pile up on executors
      dropCheckpoint(ck)
      ck = next
      round += 1
    }
    ck
  }

  /** SimHash near-dup pairs at corpus scale: the pigeonhole band
    * join. Split the `bits`-bit fingerprint into `maxDist + 1`
    * equal-width bands — any pair within Hamming distance `maxDist`
    * agrees EXACTLY on at least one band — then self-join on
    * (band, band bits), dedup candidates, and verify the true
    * distance. Unlike MinHash banding this is exact (recall 1.0 by
    * the pigeonhole principle): the all-pairs form is only the
    * oracle. Candidates per band bucket scale with near-identical
    * prefixes, not n², and the join key is a 15-bit integer.
    *
    * Output: (doc_a, doc_b, hamming), doc_a < doc_b.
    */
  def simHashNearDups(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", bits: Int = 60, maxDist: Int = 3): DataFrame = {
    val numBands = maxDist + 1
    require(bits % numBands == 0,
      s"bits $bits must divide into ${numBands} bands (maxDist + 1)")
    val w = bits / numBands
    val sh = simHash(docs, idCol, textCol, bits)
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until numBands).map(b =>
        shiftright(col("simhash"), b * w) % lit(1L << w)): _*))
        .as(Seq("band", "key")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", hammingDistance(col("sh_a"), col("sh_b")).cast("int"))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Canonical selection — the step that turns dup CLUSTERS into the
    * kept corpus: per near-dup cluster (SimHash banded pairs →
    * connected components) keep ONE representative, the document with
    * the most content (max n_chars, lowest doc_id on ties — a
    * deterministic argmax any engine replays).
    *
    * Scale shape: two map-side-combinable aggregations (per-cluster
    * max, then min-id among the maxima) joined back — no window over
    * clusters, so a pathological giant cluster costs a hash
    * aggregation, not a single-task sort.
    *
    * Output per doc: (doc_id, cluster_id, canonical_id, keep).
    */
  def canonicalDocs(docs: DataFrame, maxDist: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      sizeCol: String = "n_chars"): DataFrame = {
    val pairs = simHashNearDups(docs, maxDist = maxDist)
    val cc = connectedComponents(pairs, docs.select(col(idCol).as("doc_id")))
    val joined = cc.join(
      docs.select(col(idCol).as("doc_id"), col(sizeCol).cast("long").as("n_chars")),
      "doc_id")
    val mx = joined.groupBy(col("cluster_id")).agg(max(col("n_chars")).as("mc"))
    val rep = joined.as("j")
      .join(mx.as("m"), col("j.cluster_id") === col("m.cluster_id") &&
        col("j.n_chars") === col("m.mc"))
      .groupBy(col("j.cluster_id").as("cluster_id"))
      .agg(min(col("j.doc_id")).as("canonical_id"))
    joined.select(col("doc_id"), col("cluster_id"))
      .join(rep, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("keep"))
  }

  /** Soft dedup (DataComp-LM / SlimPajama-style down-weighting):
    * instead of DROPPING near-duplicates, give every member of a
    * duplicate cluster sampling weight 1/|cluster| so the cluster's
    * total expected contribution equals one document — the gentler
    * alternative when duplicates carry slight variation worth keeping.
    *
    * Rides the SAME banded-SimHash pair graph + union-find as
    * [[canonicalDocs]] (one extra aggregation over its output, no new
    * shuffle class); weights stay EXACT integers in micro units
    * (10⁶ // size) so an oracle replays them without float division.
    * `weighted_tokens_micro` = n_tokens·10⁶ // size is the document's
    * effective token mass — summed over the corpus it yields the
    * effective (post-soft-dedup) training token count for the data
    * card.
    *
    * Output: (doc_id, cluster_id, cluster_size, n_tokens,
    * weight_micro, weighted_tokens_micro), one row per document —
    * singletons get weight 10⁶ (kept whole).
    */
  def softDedupWeights(docs: DataFrame, maxDist: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pairs = simHashNearDups(docs, maxDist = maxDist)
    val cc = connectedComponents(pairs, docs.select(col(idCol).as("doc_id")))
    val sizes = cc.groupBy(col("cluster_id"))
      .agg(count(lit(1)).cast("long").as("cluster_size"))
    cc.join(sizes, "cluster_id")
      .join(docs.select(col(idCol).as("doc_id"),
        size(words(col(textCol))).cast("long").as("n_tokens")), "doc_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("n_tokens"),
        expr("1000000 div cluster_size").as("weight_micro"),
        expr("(n_tokens * 1000000) div cluster_size")
          .as("weighted_tokens_micro"))
  }

  /** Sub-document (chunk-level) exact dedup: split each document into
    * consecutive `chunkWords`-word chunks, find chunks that recur in
    * two or more distinct documents, and report each document's
    * duplicated-chunk fraction — the pass a training pipeline runs
    * before doc-level dedup to catch boilerplate shared across
    * otherwise-distinct pages. One shuffle on the chunk text (a
    * high-cardinality key), group-side counting; no pair enumeration
    * anywhere, so it scales linearly in corpus size.
    *
    * Documents shorter than one chunk are excluded (they have no
    * chunk to test). Output: (doc_id, n_chunks, n_dup_chunks,
    * dup_frac) — dup_frac a raw double from the exact integer counts.
    */
  def chunkDups(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkWords: Int = 10): DataFrame = {
    val ws = words(col(textCol))
    // three consumers (dup set, totals, hits) read the chunk table —
    // persist so the corpus is tokenized once, not three times
    val chunks = docs
      .select(col(idCol).as("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= chunkWords)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), floor(size(col("ws")) / chunkWords).cast("int") - 1),
          i => array_join(slice(col("ws"), (i * chunkWords + 1).cast("int"), lit(chunkWords)), " ")))
          .as("chunk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select("chunk")
    val totals = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
    val hits = chunks.join(dup, "chunk")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_chunks"))
    val out = totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        (coalesce(col("n_dup_chunks"), lit(0L)).cast("double") / col("n_chunks"))
          .as("dup_frac"))
      // per-doc rows; materialize so the chunk cache can be freed now
      .localCheckpoint(eager = true)
    chunks.unpersist()
    out
  }

  /** Exact-substring span dedup (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" family): find every
    * position where a document's sliding `n`-word gram recurs ANYWHERE
    * in the corpus (other documents or elsewhere in the same one),
    * merge the overlapping hits into maximal duplicated token SPANS,
    * and report per-document span counts and duplicated-token
    * fractions — the statistics the substring-dedup cut itself keys
    * on. Where [[chunkDups]] tests disjoint fixed chunks, this is the
    * overlapping-gram form: a duplicated passage of any length ≥ n is
    * caught at every alignment and surfaces as ONE merged span.
    *
    * Execution shape: sliding grams carry their token position; the
    * recurrence test is a count ≥ 2 aggregation on `xxhash64` of the
    * gram (8-byte shuffle key, same collision envelope as
    * [[benchmarkOverlap]] — ≈ n²/2^64 false positives, noise-floor at
    * any realistic corpus); the interval merge is a per-document
    * prefix-max window (duplicated positions per doc ≪ doc length, and
    * the window never crosses documents). No pair enumeration, no
    * suffix array — two linear aggregations, one key join, one
    * doc-partitioned window.
    *
    * Output: (doc_id, n_tokens, n_grams, n_dup_grams, n_spans,
    * dup_tokens, dup_frac) for every document; docs shorter than `n`
    * words report zero grams and zero duplication.
    */
  def dupSpans(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 8): DataFrame = {
    val ws = words(col(textCol))
    val (spans, dupPos) = dupSpanIntervals(docs, idCol, textCol, n)
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum(col("e") - col("s")).cast("long").as("dup_tokens"))
    val hits = dupPos.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_dup_grams"))
    docs.select(col(idCol).as("doc_id"),
        size(ws).cast("long").as("n_tokens"),
        greatest(size(ws) - (n - 1), lit(0)).cast("long").as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .as("dup_frac"))
  }

  /** Shared machinery for [[dupSpans]] / [[dedupCut]]: returns
    * (`spans`, `dupPos`) where `spans` is (doc_id, island, s, e) — the
    * maximal merged duplicated token intervals `[s, e)` per document —
    * and `dupPos` is the raw (doc_id, pos) duplicated-gram hit set.
    * See [[dupSpans]] for the execution-shape discussion.
    */
  private def dupSpanIntervals(docs: DataFrame, idCol: String,
      textCol: String, n: Int): (DataFrame, DataFrame) = {
    val ws = words(col(textCol))
    // the gram explode feeds BOTH the recurrence aggregation and the
    // hit join, and the partial aggregation under the former's
    // exchange defeats ReuseExchange — cache it so the tokenize +
    // hash pass runs once, then checkpoint the (small, duplicated-
    // positions-only) hit set and release the cache
    val grams = docs
      .select(col(idCol).as("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("ws")) - n),
          i => xxhash64(array_join(slice(col("ws"), (i + 1).cast("int"), lit(n)), " ")))))
      .withColumnRenamed("col", "gh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select("gh")
    val dupPos = grams.join(dup, "gh").select(col("doc_id"), col("pos"))
      .localCheckpoint(eager = true)
    grams.unpersist()
    // merge overlapping [pos, pos+n) intervals: a hit opens a new span
    // iff it starts past the running max end of everything before it
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevEnd = max(col("pos") + n)
      .over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    val islands = dupPos
      .withColumn("brk",
        when(prevEnd.isNull || col("pos") > prevEnd, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wOrd))
    val spans = islands.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), max(col("pos") + n).as("e"))
    (spans, dupPos)
  }

  /** Apply the exact-substring dedup CUT: delete every duplicated span
    * found by [[dupSpans]] from every document and reassemble the
    * surviving tokens (single-space joined) as `clean_text`. This is
    * the destructive step of the Lee et al. 2022 regime in its
    * cut-all-occurrences form: a passage that recurs anywhere in the
    * corpus is removed from BOTH sides (the common production variant —
    * keeping one canonical occurrence needs a global owner election
    * that buys little at corpus scale, where boilerplate is the target).
    *
    * Execution shape: the span set is tiny relative to the corpus
    * (duplicated islands only), so the token-level removal is an
    * equi-join on doc_id with a residual range predicate against each
    * document's OWN spans — never a corpus-wide interval join — and
    * the reassembly is one doc-keyed sort-within-group aggregation.
    *
    * Output: (doc_id, n_tokens, n_tokens_kept, clean_text) for every
    * document; untouched docs pass through with their token stream
    * re-joined (whitespace normalized), fully-duplicated docs emit
    * `clean_text = ""`.
    */
  def dedupCut(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 8): DataFrame = {
    val ws = words(col(textCol))
    val (spans, _) = dupSpanIntervals(docs, idCol, textCol, n)
    val toks = docs
      .select(col(idCol).as("doc_id"), posexplode(ws))
      .withColumnRenamed("col", "w")
    val kept = toks.join(spans,
      toks("doc_id") === spans("doc_id") &&
        col("pos") >= col("s") && col("pos") < col("e"),
      "left_anti")
    val rebuilt = kept
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens_kept"),
        array_join(array_sort(collect_list(struct(col("pos"), col("w"))))
          .getField("w"), " ").as("clean_text"))
    docs.select(col(idCol).as("doc_id"), size(ws).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Corpus-level line deduplication — the RefinedWeb / CCNet
    * boilerplate-removal pass: a line recurring across at least
    * `minDocs` DISTINCT documents is boilerplate (headers, footers,
    * nav chrome, cookie banners, license blurbs) and is removed from
    * EVERY document; each document is then reconstructed from its
    * surviving lines in order.
    *
    * Execution shape: lines explode once; the recurrence aggregation
    * runs on the 8-byte `xxhash64` of the line (a (hash, doc)
    * pre-distinct then a map-side-combinable per-hash count), so raw
    * line text never enters the frequency shuffle; the boilerplate
    * hit set joins back hash-to-hash as a `left_anti` (broadcast when
    * small — the common case, since boilerplate is by definition the
    * high-recurrence tail); reconstruction is the [[dedupCut]]
    * rebuild idiom — one groupBy over surviving (doc, idx, line)
    * rows. Cost is O(total lines) end to end; nothing is quadratic
    * in corpus size, and the only wide rows (line text) move in the
    * per-document rebuild exchange.
    *
    * Output: (doc_id, n_lines, n_kept, clean_text), one row per
    * input document (a document whose every line was boilerplate
    * comes back with n_kept = 0 and empty text).
    */
  def lineDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minDocs: Int = 2): DataFrame = {
    // r12 optimization-round shape: the boilerplate decision needs only
    // (doc_id, line_idx, xxhash64(line)) — shuffling the line TEXT
    // through the anti-join and the per-doc rebuild moved the whole
    // corpus twice for a decision its hashes carry in ~20 bytes/row
    // (guide §2.3: shuffle keys and metadata instead of payloads).
    // The kept line indices rejoin the original docs once (by doc_id,
    // the join the final projection already paid) and clean_text
    // rebuilds from the doc's own split — byte-identical output: each
    // occurrence keeps/drops by the same lh, indices sort ascending
    // exactly as the old (line_idx, line) struct sort did.
    val lines = docs
      .select(col(idCol).as("doc_id"), posexplode(split(col(textCol), "\n")))
      .select(col("doc_id"), col("pos").as("line_idx"),
        xxhash64(col("col")).as("lh"))
    val boiler = lines.select(col("lh"), col("doc_id")).distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("docs"))
      .filter(col("docs") >= minDocs)
      .select("lh")
    // r13: aggregate the DROPPED indices, not the kept ones — the
    // boilerplate hits are the sparse side of the decision (2 of 9
    // lines/doc on the crawl rehearsal), so the rebuild groupBy
    // exchanges ~n_hits rows instead of ~n_lines, and the per-doc drop
    // table is small enough for the final join to broadcast it onto
    // the text scan in the common case — the full-text side then never
    // exchanges at all. Output-identical: kept = lines whose index is
    // not in `dropped`, in ascending position order (exactly the old
    // sorted kept-index rebuild); a doc with EVERY line boilerplate
    // filters to an empty array → n_kept 0, clean_text "" (the old
    // missing-keptIdx-row case), and a doc with NO boilerplate line
    // has no dropped row → the null guard keeps every line.
    val droppedIdx = lines.join(boiler, Seq("lh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("line_idx"))).as("dropped"))
    docs.select(col(idCol).as("doc_id"), split(col(textCol), "\n").as("ls"))
      .join(droppedIdx, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("ls")).cast("long").as("n_lines"),
        (size(col("ls")) - coalesce(size(col("dropped")), lit(0)))
          .cast("long").as("n_kept"),
        array_join(filter(col("ls"), (_, i) =>
          coalesce(!array_contains(col("dropped"), i), lit(true))), "\n")
          .as("clean_text"))
  }

  /** Cross-source duplication matrix: for every unordered pair of
    * corpus sources, the number of distinct word `n`-grams they share
    * and the Jaccard overlap of their gram sets — the curation report
    * that tells you two crawls/dumps substantially duplicate each
    * other BEFORE committing to a mixture.
    *
    * Execution shape: distinct (source, gram-hash) pairs (one
    * map-side-combinable distinct), then a groupBy on the gram hash
    * collecting the source SET — bounded by the number of sources, a
    * metadata-scale constant, so no collect_set ever grows with the
    * corpus — exploded into per-gram source pairs and count-aggregated.
    * No gram-keyed self-join (whose hot common grams would square), no
    * doc-pair enumeration. Gram identity is `xxhash64` (the documented
    * ≈ n²/2^64 collision envelope).
    *
    * Output: (source_a, source_b, shared_grams, n_grams_a, n_grams_b,
    * jaccard) for every source pair sharing ≥ 1 gram, source_a <
    * source_b.
    */
  def sourceOverlap(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", srcCol: String = "source",
      n: Int = 8): DataFrame = {
    val ws = words(col(textCol))
    val grams = docs
      .select(col(srcCol).as("src"), ws.as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("src"),
        explode(transform(
          sequence(lit(0), size(col("ws")) - n),
          i => xxhash64(array_join(slice(col("ws"), (i + 1).cast("int"), lit(n)), " ")))).as("gh"))
      .distinct()
    val perSource = grams.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("n_grams"))
    val pairs = grams.groupBy(col("gh"))
      .agg(sort_array(collect_set(col("src"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(explode(flatten(transform(col("srcs"), (a, i) =>
        transform(slice(col("srcs"), (i + 2).cast("int"), size(col("srcs"))),
          b => struct(a.as("source_a"), b.as("source_b")))))).as("p"))
      .select(col("p.source_a"), col("p.source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).cast("long").as("shared_grams"))
    pairs
      .join(perSource.withColumnRenamed("src", "source_a")
        .withColumnRenamed("n_grams", "n_grams_a"), Seq("source_a"))
      .join(perSource.withColumnRenamed("src", "source_b")
        .withColumnRenamed("n_grams", "n_grams_b"), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("shared_grams"),
        col("n_grams_a"), col("n_grams_b"),
        (col("shared_grams").cast("double") /
          (col("n_grams_a") + col("n_grams_b") - col("shared_grams")))
          .as("jaccard"))
  }

  /** Benchmark-contamination detection: for every corpus document,
    * the fraction of its distinct word n-grams that also occur in a
    * benchmark (held-out test) document set — the screen run before
    * training so evaluation data doesn't leak into the corpus. The
    * benchmark n-gram set is deduplicated and joined against the
    * corpus on `xxhash64` of the n-gram — an 8-byte shuffle key in
    * place of ~50-60 bytes of raw 8-gram text (~7× less shuffle
    * volume; Spark broadcasts the benchmark side when small,
    * hash-shuffles otherwise). A 64-bit hash join can overcount only
    * on a hash collision between a corpus and benchmark n-gram:
    * ≈ n_corpus·n_bench / 2^64, i.e. < 1e-4 expected false positives
    * even at 10^9 × 10^7 n-grams — far below the dedup noise floor.
    * Per-doc totals come from a map-side-combinable count, so the
    * whole operator is two linear aggregations and one key join — no
    * cross product at any scale.
    *
    * Documents with fewer than `n` words have no n-gram to test and
    * are excluded. Output: (doc_id, n_ngrams, n_contaminated,
    * contaminated_frac) for every corpus doc.
    */
  /** Distinct word n-grams per document: (doc_id, ng). Shared by the
    * contamination screens; docs shorter than `n` words emit nothing.
    */
  private def distinctWordGrams(df: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val ws = words(col(textCol))
    df.select(col(idCol).as("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), size(col("ws")) - n),
          i => array_join(slice(col("ws"), (i + 1).cast("int"), lit(n)), " "))))
          .as("ng"))
  }

  def benchmarkOverlap(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 8): DataFrame = {
    def grams(df: DataFrame): DataFrame = distinctWordGrams(df, idCol, textCol, n)
    // totals and hits both read the corpus grams — tokenize once;
    // only the 8-byte hash is kept (and shuffled), never the text
    val corpusGrams = grams(corpus)
      .select(col("doc_id"), xxhash64(col("ng")).as("ngh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val benchGrams = grams(benchmark).select(xxhash64(col("ng")).as("ngh")).distinct()
    val totals = corpusGrams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ngrams"))
    val hits = corpusGrams.join(benchGrams, "ngh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    val out = totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_ngrams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)).cast("double") / col("n_ngrams"))
          .as("contaminated_frac"))
      // per-doc rows; materialize so the n-gram cache can be freed now
      .localCheckpoint(eager = true)
    corpusGrams.unpersist()
    out
  }

  /** [[benchmarkOverlap]] with an explicit bloom-filter semi-join
    * reduction (the `InjectRuntimeFilter` pattern, armed
    * deterministically): the benchmark n-gram hashes aggregate into a
    * bloom filter ([[org.apache.spark.sql.graftext.BloomSemi]],
    * distributed partial blooms OR-merged), and corpus-side grams are
    * probed against it MAP-SIDE, before the hit join's shuffle. At
    * 100 TB the corpus side is ~everything and overlap is rare, so
    * the bloom drops ~99% of gram rows before they ever hit the
    * network; the surviving candidates still go through the exact
    * hash join, which removes the bloom's false positives — the
    * result is bit-identical to the exact screen (blooms have no
    * false negatives), only the shuffle volume changes.
    *
    * Driver traffic is one binary filter (numBits/8 bytes — the
    * query-side-broadcast contract, same as the ANN query sets), NOT
    * corpus data. `expectedItems` sizes the filter; pass the known
    * benchmark gram count, or an upper bound (default 1M items →
    * 1.25 MB filter at 10 bits/item, ≈0.9% FP).
    *
    * Output: (doc_id, n_ngrams, n_contaminated, contaminated_frac,
    * keep) — `keep` is the screen decision at `maxFrac`.
    */
  def benchmarkOverlapBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 8,
      expectedItems: Long = 1L << 20, maxFrac: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.graftext.BloomSemi
    val benchGrams = distinctWordGrams(benchmark, idCol, textCol, n)
      .select(xxhash64(col("ng")).as("ngh")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bf: Array[Byte] = benchGrams
      .agg(BloomSemi.bloomFilterAgg(col("ngh"), expectedItems).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val corpusGrams = distinctWordGrams(corpus, idCol, textCol, n)
      .select(col("doc_id"), xxhash64(col("ng")).as("ngh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = corpusGrams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ngrams"))
    // the semi-join reduction: bloom probe map-side, exact join on
    // the ~surviving candidates only
    val hits = corpusGrams
      .filter(BloomSemi.mightContain(lit(bf), col("ngh")))
      .join(benchGrams, "ngh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    val out = totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_ngrams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)).cast("double") / col("n_ngrams"))
          .as("contaminated_frac"))
      .withColumn("keep", col("contaminated_frac") <= maxFrac)
      .localCheckpoint(eager = true)
    corpusGrams.unpersist()
    benchGrams.unpersist()
    out
  }

  /** Auto-selecting contamination screen: picks the exact hash-join
    * plan ([[benchmarkOverlap]]) or the bloom semi-join plan
    * ([[benchmarkOverlapBloom]]) from the corpus/benchmark size
    * ratio. Both plans return bit-identical rows (the bloom has no
    * false negatives and the exact join removes its false
    * positives), so this is purely a COST decision:
    *
    *   - the bloom's extra cost is one full pass over the benchmark
    *     grams plus a filter broadcast — O(benchmark), paid always;
    *   - its saving is the pruned fraction of the corpus-gram
    *     shuffle — O(corpus), realized only when the corpus side
    *     dwarfs the benchmark side AND is big enough that shuffle
    *     volume (not constants) dominates. At sf0.1 the inversion is
    *     measured: the bloom screen ran ~2.5× the exact one (d54
    *     2.5–3.1 s vs t54 1.0 s, BENCH_r06) because the whole
    *     corpus-gram stream costs less than building the filter.
    *
    * Hence both conditions gate arming: corpus docs ≥ `bloomRatio` ×
    * benchmark docs (prune leverage exists) and corpus docs ≥
    * `bloomCorpusFloor` (the regime where the shuffle is worth
    * pruning — two count-star jobs, metadata-cheap next to the gram
    * explode either plan runs). The 100 TB crawl-vs-benchmark case
    * (billions vs thousands of docs) always arms; gate-sized inputs
    * never do. The decision rides in the return value (same contract
    * as [[lshCandidatesWithDecision]]).
    */
  def benchmarkOverlapAuto(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 8,
      expectedItems: Long = 1L << 20, maxFrac: Double = 0.05,
      bloomRatio: Long = 8L, bloomCorpusFloor: Long = 100000L): (DataFrame, Boolean) = {
    val nCorpus = corpus.count()
    val nBench = benchmark.count()
    val arm = nCorpus >= bloomCorpusFloor &&
      nCorpus >= bloomRatio * math.max(1L, nBench)
    if (arm)
      (benchmarkOverlapBloom(corpus, benchmark, idCol, textCol, n,
        expectedItems, maxFrac), true)
    else
      (benchmarkOverlap(corpus, benchmark, idCol, textCol, n)
        .withColumn("keep", col("contaminated_frac") <= maxFrac), false)
  }

  /** Longest-contaminated-RUN screen — the contiguous-span overlap
    * metric decontamination actually keys on (GPT-3/GPT-4 report
    * substring collisions of ≥ N tokens, Carlini et al. measure
    * memorization by longest verbatim span): [[benchmarkOverlap]]'s
    * bag-of-distinct-grams fraction cannot distinguish a document
    * that QUOTES 50 consecutive benchmark tokens from one that shares
    * 43 scattered stopword grams, but the quote is the leak.
    *
    * Per corpus doc: positional word n-grams, each tested for
    * membership in the benchmark's distinct gram set; the longest run
    * of CONSECUTIVE matching positions r converts to a longest
    * overlapping token span of r+n−1. One gram-key join (8-byte
    * xxhash64 keys, same collision envelope as the screens above);
    * the run computation windows over MATCHING positions only —
    * contamination is rare at corpus scale, so the windowed set is
    * tiny even when the corpus is not. Runs are found with the
    * classic gaps-and-islands trick (pos − row_number is constant
    * within a consecutive run), never a per-token scan.
    *
    * Output: (doc_id, n_grams, n_hit_grams, max_run,
    * max_overlap_tokens, flagged) for every corpus doc with ≥ 1 gram;
    * `flagged` = max_overlap_tokens ≥ `flagTokens`.
    */
  def overlapRun(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 8,
      flagTokens: Int = 16): DataFrame = {
    val ws = words(col(textCol))
    // positional (not distinct) grams — runs need every position
    val posGrams = corpus
      .select(col(idCol).as("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("ws")) - n),
          i => xxhash64(array_join(slice(col("ws"), (i + 1).cast("int"), lit(n)), " ")))))
      .withColumnRenamed("col", "ngh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val benchGrams = distinctWordGrams(benchmark, idCol, textCol, n)
      .select(xxhash64(col("ng")).as("ngh")).distinct()
    val hits = posGrams.join(benchGrams, "ngh").select(col("doc_id"), col("pos"))
    // gaps-and-islands over the (small) hit set only
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = hits
      .withColumn("grp", col("pos") - row_number().over(wOrd))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).cast("long").as("run"))
      .groupBy(col("doc_id"))
      .agg(max(col("run")).as("max_run"),
        sum(col("run")).cast("long").as("n_hit_grams"))
    val totals = posGrams.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_grams"))
    val out = totals.join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        coalesce(col("max_run"), lit(0L)).as("max_run"),
        when(coalesce(col("max_run"), lit(0L)) > 0,
          coalesce(col("max_run"), lit(0L)) + (n - 1)).otherwise(lit(0L))
          .as("max_overlap_tokens"))
      .withColumn("flagged", col("max_overlap_tokens") >= flagTokens)
      .localCheckpoint(eager = true)
    posGrams.unpersist()
    out
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
    * the MOSS local document-fingerprinting algorithm): hash every
    * character k-gram, slide a window of `w` consecutive gram hashes,
    * and select each window's minimum with RIGHTMOST tie-break. The
    * guarantee: any substring match of length ≥ k+w−1 between two
    * documents shares a selected fingerprint, while only ~2/(w+1) of
    * gram hashes are kept — the position-robust sketch for overlap
    * detection that pure bag-of-shingles methods can't give.
    *
    * A typed per-partition kernel — no shuffle, no window function;
    * cost is O(len·w) per doc and embarrassingly parallel, so the
    * shape is corpus-size-proof. (The first cut expressed this with
    * array higher-order functions; Spark evaluates HOF lambdas
    * INTERPRETED and re-evaluates the nested gram-hash array per
    * window element, which turned O(len·w) into O(len²) interpreted
    * md5 calls — ~45 CPU-minutes for one sf0.1 partition. The kernel
    * computes the identical md5-derived keys in plain JVM.) Hashes
    * are the top 40 bits of md5 so an oracle replays selection
    * bit-exactly; tie-breaks never fire because each gram's key packs
    * (hash, 2²⁰−1−pos) into one long — equal hashes at different
    * positions still order, and smaller key = larger pos = rightmost.
    *
    * Output: (doc_id, n_grams, n_fp, fp_hash) where fp_hash pins the
    * exact selected (position, hash) set.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val spark = docs.sparkSession
    import spark.implicits._
    val posRange = 1048576L // 2^20 positions; 40-bit hash above keeps keys < 2^60
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          // code points, matching SQL substr/length character semantics
          val cps = text.codePoints().toArray
          val ng = math.max(cps.length - (k - 1), 0)
          val keys = new Array[Long](ng)
          var i = 0
          while (i < ng) {
            val gram = new String(cps, i, k)
            val d = md.digest(gram.getBytes("UTF-8"))
            md.reset()
            // top 40 bits of the digest = first 10 hex chars of md5()
            val h = ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
              ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
            keys(i) = h * posRange + (posRange - 1 - i)
            i += 1
          }
          val sel = mutable.LinkedHashSet.empty[Long]
          if (ng >= 1) {
            var s = 0
            val lastStart = math.max(ng - w, 0)
            while (s <= lastStart) {
              var m = Long.MaxValue
              var j = s
              val end = math.min(s + w, ng)
              while (j < end) { if (keys(j) < m) m = keys(j); j += 1 }
              sel += m
              s += 1
            }
          }
          val parts = sel.toArray.map { key =>
            val pos = posRange - 1 - java.lang.Math.floorMod(key, posRange)
            val hash = java.lang.Math.floorDiv(key, posRange)
            f"$pos%07d:$hash%d"
          }
          java.util.Arrays.sort(parts.asInstanceOf[Array[Object]])
          val joined = parts.mkString(",")
          val fpHash = md.digest(joined.getBytes("UTF-8"))
            .map(b => f"${b & 0xff}%02x").mkString
          md.reset()
          (id, ng, sel.size, fpHash)
        }
      }
      .toDF("doc_id", "n_grams", "n_fp", "fp_hash")
  }

  /** Prefix-filtered exact similarity join over distinct word
    * k-shingle sets — the AllPairs/PPJoin prefix filter (Bayardo et
    * al., WWW'07; Xiao et al., WWW'08): order every document's
    * shingles by the global (document-frequency asc, shingle asc)
    * total order, emit only the first |X| − ⌈τ·|X|⌉ + 1 rarest
    * shingles as join keys, and verify candidates exactly. Recall is
    * exact by pigeonhole: J(A,B) ≥ τ forces |A∩B| ≥ ⌈τ·|X|⌉ for both
    * sets, so two disjoint prefixes would leave too few shingles to
    * intersect. A length filter (min·10⁶ ≥ τµ·max) prunes
    * size-incompatible pairs before the verify join. vs the plain
    * co-occurrence join (d41's shape) the candidate space shrinks
    * from every shared shingle to shared RARE shingles — the
    * standard exact similarity-join shape at corpus scale, and the
    * deterministic alternative to MinHash-LSH (d42) when recall must
    * be provably 1.0.
    *
    * Thresholds compare in exact micro-integer arithmetic (τ·10⁶)
    * so engines with decimal literals agree at boundary counts.
    *
    * Output: (doc_a, doc_b, inter, size_a, size_b, jaccard) with
    * doc_a < doc_b, shingle-set Jaccard ≥ τ.
    */
  /** Asymmetric CONTAINMENT near-dup join: emit (small, big) document
    * pairs where the smaller shingle set is ≥ τ contained in the
    * larger — |A∩B| / |A| with |A| = min(|A|,|B|). Jaccard misses
    * these by construction (a page quoted inside a 100× longer page
    * has J ≈ 0.01 at containment 1.0), yet quote/wrapper/aggregator
    * duplication is exactly what a crawl corpus is full of — the
    * reference's near-dup surface (ngff-zarr has none; this is the
    * training-pipeline tier the brief adds) needs the asymmetric
    * variant alongside d41/d42.
    *
    * Shape: the prefix-filter containment join. Only the PROBE side
    * (each doc in its potential small-side role) emits join keys — its
    * |A| − ⌈τ·|A|⌉ + 1 rarest shingles by the global (df asc, shingle
    * asc) total order; the index side emits every shingle. Recall is
    * exact by pigeonhole: containment ≥ τ forces |A∩B| ≥ ⌈τ·|A|⌉, so
    * ANY |A| − ⌈τ·|A|⌉ + 1 shingles of A hit the intersection at least
    * once. Candidates verify exactly via array_intersect — never an
    * all-pairs product, and rarest-first prefixes keep per-key join
    * fanout minimal (boilerplate shingles live outside most prefixes;
    * residual hot index keys are AQE skew-join territory).
    *
    * The size-side rule (a.sz < b.sz, ties by id) halves the candidate
    * space and fixes each pair's denominator deterministically.
    * Thresholds compare in exact micro-integer arithmetic.
    *
    * Output: (doc_small, doc_big, inter, size_small, size_big,
    * containment) with containment rounded 6dp, ≥ τ.
    */
  def containmentPairs(docs: DataFrame, minContainment: Double,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 3): DataFrame = {
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0, 1], got $minContainment")
    require((minContainment * 1e6).isWhole,
      s"minContainment must be exact in micro units, got $minContainment")
    val tauMicro = math.round(minContainment * 1e6)
    val sets = shingleSets(docs, idCol, textCol, k) // (doc_id, sh): distinct shingles
    val tok = sets.select(col("doc_id"), explode(col("sh")).as("w"))
    val dfTab = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // per-doc shingles in global rarest-first order, prefix length
    // |A| − ⌈τ·|A|⌉ + 1 (exact integer ceil; see prefixJaccardPairs)
    val sorted = tok.join(dfTab, "w")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))
      .withColumn("plen",
        col("sz") - expr(s"(cast($tauMicro as bigint) * sz + 999999) div 1000000") + 1)
    val probe = sorted.select(col("doc_id"), col("sz"),
      explode(slice(col("toks").getField("w"), lit(1), col("plen").cast("int"))).as("w"))
    val full = sets.select(col("doc_id"), size(col("sh")).cast("long").as("sz"),
      explode(col("sh")).as("w"))
    val cand = probe.as("a")
      .join(full.as("b"),
        col("a.w") === col("b.w") &&
          (col("a.sz") < col("b.sz") ||
            (col("a.sz") === col("b.sz") && col("a.doc_id") < col("b.doc_id"))))
      .select(col("a.doc_id").as("doc_small"), col("b.doc_id").as("doc_big"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("doc_small"), col("sh").as("sh_a")), "doc_small")
      .join(sets.select(col("doc_id").as("doc_big"), col("sh").as("sh_b")), "doc_big")
      .select(col("doc_small"), col("doc_big"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
        size(col("sh_a")).cast("long").as("size_small"),
        size(col("sh_b")).cast("long").as("size_big"))
      .filter(col("inter") * 1000000L >= lit(tauMicro) * col("size_small"))
      .withColumn("containment",
        round(col("inter").cast("double") / col("size_small").cast("double"), 6))
  }

  def prefixJaccardPairs(docs: DataFrame, minJaccard: Double,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 3): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0, 1], got $minJaccard")
    require((minJaccard * 1e6).isWhole,
      s"minJaccard must be exact in micro units, got $minJaccard")
    val tauMicro = math.round(minJaccard * 1e6)
    val sets = shingleSets(docs, idCol, textCol, k) // (doc_id, sh): distinct shingles
    val tok = sets.select(col("doc_id"), explode(col("sh")).as("w"))
    // global rarest-first order: (df asc, shingle asc) is total (the
    // shingle is unique), so prefixes are well-defined without
    // assigning explicit ranks — the df table is vocabulary-sized,
    // the join key high-cardinality
    val dfTab = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val sorted = tok.join(dfTab, "w")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("toks"))
      .withColumn("sz", size(col("toks")))
      .withColumn("plen",
        col("sz") - expr(s"(cast($tauMicro as bigint) * sz + 999999) div 1000000") + 1)
    val prefix = sorted.select(col("doc_id"), col("sz"),
      explode(slice(col("toks").getField("w"), lit(1), col("plen").cast("int"))).as("w"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")).cast("long") * 1000000L >=
            lit(tauMicro) * greatest(col("a.sz"), col("b.sz")).cast("long"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
        size(col("sh_a")).as("size_a"), size(col("sh_b")).as("size_b"))
      .filter(col("inter") * 1000000L >=
        lit(tauMicro) * (col("size_a") + col("size_b") - col("inter")).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("size_a") + col("size_b") - col("inter")).cast("double"))
  }
}
