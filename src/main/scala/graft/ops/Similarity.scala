package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and a
  * sign-random-projection (SRP) LSH bucketed variant as the scale
  * path — at 100 TB the bucket filter touches only colliding vectors
  * instead of the full n×m cross product.
  *
  * Vector math runs in typed JVM kernels over primitive arrays
  * (mapPartitions with the small side broadcast): the higher-order
  * `zip_with`/`aggregate` expressions are interpreted per element
  * with boxing and measured ~20× slower on the same data. Cosines
  * accumulate sequentially in index order and round exactly like
  * Spark's `round` (binary-expansion HALF_UP), so results stay
  * bit-identical to the DuckDB oracle.
  */
object Similarity {

  /** Elementwise float→double cast so downstream arithmetic is
    * double-precision everywhere (and matches any SQL oracle).
    * A native array cast — codegen'd elementwise, unlike
    * `transform(arr, _.cast(...))` whose lambda is interpreted per
    * element (measured ~2× on the ANN queries' scan stage).
    */
  def asDouble(arr: Column): Column = arr.cast("array<double>")

  /** Spark-`round`-compatible rounding of a double (Round expression
    * semantics: full binary expansion, HALF_UP). NaN — a cosine
    * against a zero vector — maps to 0.0 ("no direction, no
    * similarity"), deterministic where BigDecimal would throw.
    */
  def round6(x: Double): Double =
    if (x.isNaN) 0.0
    else {
      // Fast path (r12 optimization round): the BigDecimal expansion is
      // ~30× the cost of the whole cosine in the ANN hot loops (~130M
      // calls per s_ann1m run). HALF_UP at 6dp is n = floor(|x|·10⁶ +
      // 1/2) with the sign re-applied; computing t = |x|·1e6 + 0.5 in
      // doubles perturbs the exact value by at most one rounding error
      // of the multiply plus one of the add — < 2 ulp(t) — so floor(t)
      // equals the exact n whenever t is farther than the guard band
      // from an integer; only boundary-straddling inputs fall back to
      // the exact BigDecimal path. The band scales with magnitude
      // (r13, VERDICT item 4): a fixed 1e-9 only covers |x| ≲ 4.5 —
      // round6 also rounds unbounded squared L2 distances
      // (nearestCentroidsL2), where ulp(t) exceeds 1e-9 — so the band
      // is max(1e-9, 4·ulp(t)), ≥ 2× the worst-case FP displacement at
      // every magnitude. The final n/1e6 is IEEE-correctly-rounded
      // division of two exact values, which is the same double
      // BigDecimal(n·10⁻⁶).doubleValue() returns.
      val ax = math.abs(x)
      val t = ax * 1e6 + 0.5
      if (t < 4.503599627370496e15) { // 2⁵² — beyond it floor is ill-posed
        val n = math.floor(t)
        val band = math.max(1e-9, 4.0 * Math.ulp(t))
        if (t - n > band && (n + 1) - t > band)
          (if (x < 0 && n > 0) -n else n) / 1e6 // n=0 stays +0.0, as BigDecimal returns
        else
          new java.math.BigDecimal(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      } else
        new java.math.BigDecimal(x)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }

  /** Sequential-order cosine of two equal-length arrays. */
  def cosineJvm(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Σaᵢ² accumulated in index order then √ — the exact `na`/`nb`
    * factor of [[cosineJvm]], exposed so hot loops can hoist the
    * norms of a reused side (queries, centroids, the candidate row)
    * instead of re-accumulating them per pair. `dotJvm / (normJvm(a)
    * · normJvm(b))` is bit-identical to `cosineJvm(a, b)`: the same
    * additions in the same order, the same final expression.
    */
  private[ops] def normJvm(v: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  private[ops] def dotJvm(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) { d += a(i) * b(i); i += 1 }
    d
  }

  /** Index of the nearest centroid under the shared (round6 cosine
    * desc, cid asc) ranking, with centroid norms hoisted by the caller
    * (once per partition) and round6 deferred to NEAR-TIES only: if
    * the raw-cosine winner leads every other candidate by more than
    * 1e-6 (+ margin), rounding — which moves each value by at most
    * 5e-7 + one ulp — cannot reorder them, so the BigDecimal-exact
    * rounding runs only on the rare near-tie set. NaN cosines (zero
    * vectors) substitute 0.0, exactly what round6(NaN) returns.
    */
  private[ops] def nearest1(cents: Array[(Long, Array[Double])],
      cnorms: Array[Double], v: Array[Double]): Int = {
    val vn = normJvm(v)
    val n = cents.length
    val cos = new Array[Double](n)
    var bestRaw = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val c = dotJvm(v, cents(i)._2) / (vn * cnorms(i))
      cos(i) = if (c.isNaN) 0.0 else c
      if (cos(i) > bestRaw) bestRaw = cos(i)
      i += 1
    }
    // near-tie set: candidates rounding could still promote
    var tieCount = 0
    var tieIdx = -1
    i = 0
    while (i < n) {
      if (bestRaw - cos(i) <= 1.0001e-6) { tieCount += 1; tieIdx = i }
      i += 1
    }
    if (tieCount == 1) tieIdx
    else {
      var bestI = -1
      var bestR = Double.NegativeInfinity
      var bestId = Long.MaxValue
      i = 0
      while (i < n) {
        if (bestRaw - cos(i) <= 1.0001e-6) {
          val r = round6(cos(i))
          if (r > bestR || (r == bestR && cents(i)._1 < bestId)) {
            bestR = r; bestId = cents(i)._1; bestI = i
          }
        }
        i += 1
      }
      bestI
    }
  }

  /** Column-expression cosine (kept for composability in plans). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def collectVecs(df: DataFrame): Array[(Long, Array[Double])] = {
    import df.sparkSession.implicits._
    df.select("id", "vec").as[(Long, Array[Double])].collect()
  }

  /** Partition-local top-k pre-aggregation under the shared ANN order
    * (score desc, neighbor id asc): per query, a bounded heap keeps the
    * k best rows of the partition, so the global ranking window only
    * shuffles ≤ partitions·queries·k rows instead of the full
    * |candidates|·|queries| scored stream (guide §2.3: aggregate before
    * you shuffle). Exact: the order is a strict total order (ids are
    * unique per query; round6 never emits NaN or −0.0, so JVM
    * Double.compare agrees with Spark's sort), and every global top-k
    * row is by definition in its partition's top-k.
    */
  private def partialTopK(it: Iterator[(Long, Long, Double)],
      k: Int): Iterator[(Long, Long, Double)] = {
    // heap head = worst kept row: lowest score, then LARGEST id
    val cmp = new java.util.Comparator[(Long, Double)] {
      def compare(x: (Long, Double), y: (Long, Double)): Int = {
        val c = java.lang.Double.compare(x._2, y._2)
        if (c != 0) c else java.lang.Long.compare(y._1, x._1)
      }
    }
    val heaps = new java.util.HashMap[Long, java.util.PriorityQueue[(Long, Double)]]()
    it.foreach { case (q, id, s) =>
      var h = heaps.get(q)
      if (h == null) {
        h = new java.util.PriorityQueue[(Long, Double)](k + 1, cmp)
        heaps.put(q, h)
      }
      if (h.size < k) h.add((id, s))
      else {
        val w = h.peek()
        val c = java.lang.Double.compare(s, w._2)
        if (c > 0 || (c == 0 && id < w._1)) { h.poll(); h.add((id, s)); () }
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.entrySet().iterator().asScala.flatMap { e =>
      val q = e.getKey.longValue()
      e.getValue.iterator().asScala.map(v => (q, v._1, v._2))
    }
  }

  /** Shared deterministic top-k ranking over (query_id, neighbor_id,
    * cos) scores: 6dp-rounded cosine desc, neighbor id asc — the one
    * definition all ANN variants (brute force, SRP-LSH, IVF) must
    * agree on for cross-engine parity. A [[partialTopK]] pass prunes
    * each partition to its k best rows per query before the window
    * shuffle.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val pruned = scored
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("cos").cast("double"))
      .as[(Long, Long, Double)]
      .mapPartitions(it => partialTopK(it, k))
      .toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pruned.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Brute-force cosine top-k: queries (small) broadcast, candidates
    * scanned partition-local — the only shuffle is the final
    * per-query top-k (k rows per query). Ranking is deterministic:
    * cosine rounded to 6dp, neighbor id tiebreak.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(collectVecs(queries))
    val scored = candidates.select("id", "vec").as[(Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bc.value
        val qn = qs.map(q => normJvm(q._2)) // hoisted once per task
        it.flatMap { case (cid, cv) =>
          val cvn = normJvm(cv) // once per candidate, not once per query
          qs.indices.iterator.collect { case j if qs(j)._1 != cid =>
            (qs(j)._1, cid, round6(dotJvm(qs(j)._2, cv) / (qn(j) * cvn)))
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    rankTopK(scored, k)
  }

  /** Diversity-capped retrieval: brute-force cosine scoring, then at
    * most `perGroup` hits per candidate group (source / domain /
    * shard) BEFORE the global top-k — the result-diversification
    * contract behind federated search and RAG source balancing (a
    * plain top-k lets one near-duplicate-rich source crowd out the
    * rest). Same broadcast-queries candidate scan as
    * [[bruteForceTopK]]; both caps are rank filters under the
    * deterministic (6dp cosine desc, id asc) order, sharing ONE
    * window sort per (query, group) pass.
    */
  def diversityTopK(queries: DataFrame, candidates: DataFrame,
      groupCol: String, k: Int, perGroup: Int): DataFrame = {
    require(k >= 1 && perGroup >= 1, s"k=$k perGroup=$perGroup must be >= 1")
    val spark = queries.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(collectVecs(queries))
    val scored = candidates
      .select(col("id"), col("vec"), col(groupCol).cast("long").as("grp"))
      .as[(Long, Array[Double], Long)]
      .mapPartitions { it =>
        val qs = bc.value
        val qn = qs.map(q => normJvm(q._2)) // hoisted once per task
        val scoredIt = it.flatMap { case (cid, cv, grp) =>
          val cvn = normJvm(cv)
          qs.indices.iterator.collect { case j if qs(j)._1 != cid =>
            (qs(j)._1, cid, grp, round6(dotJvm(qs(j)._2, cv) / (qn(j) * cvn)))
          }
        }
        // partition-local (query, group) cap: only the perGroup best
        // rows of each (q, grp) in this partition can survive the
        // global per-group rank filter, so prune before the shuffle
        // (exact under the same strict total order as the window)
        val cmp = new java.util.Comparator[(Long, Double)] {
          def compare(x: (Long, Double), y: (Long, Double)): Int = {
            val c = java.lang.Double.compare(x._2, y._2)
            if (c != 0) c else java.lang.Long.compare(y._1, x._1)
          }
        }
        val heaps =
          new java.util.HashMap[(Long, Long), java.util.PriorityQueue[(Long, Double)]]()
        scoredIt.foreach { case (q, id, grp, s) =>
          val key = (q, grp)
          var h = heaps.get(key)
          if (h == null) {
            h = new java.util.PriorityQueue[(Long, Double)](perGroup + 1, cmp)
            heaps.put(key, h)
          }
          if (h.size < perGroup) h.add((id, s))
          else {
            val w = h.peek()
            val c = java.lang.Double.compare(s, w._2)
            if (c > 0 || (c == 0 && id < w._1)) { h.poll(); h.add((id, s)); () }
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.entrySet().iterator().asScala.flatMap { e =>
          val (q, grp) = e.getKey
          e.getValue.iterator().asScala.map(v => (q, v._1, grp, v._2))
        }
      }.toDF("query_id", "doc_id", "grp", "cos")
    val wg = Window.partitionBy(col("query_id"), col("grp"))
      .orderBy(col("cos").desc, col("doc_id").asc)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("doc_id").asc)
    scored.withColumn("gr", row_number().over(wg))
      .filter(col("gr") <= perGroup)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "grp", "cos")
  }

  /** Deterministic SRP hyperplane matrix (numPlanes × dim) in
    * [-0.5, 0.5): every executor regenerates the same planes from the
    * md5 digest of "plane{j}:{i}" (no broadcast state needed), and an
    * SQL oracle reproduces the exact same doubles via
    * `('0x' || substr(md5(...), 1, 14))::BIGINT % 1000000 / 1e6 - 0.5`.
    */
  def srpPlanes(dim: Int, numPlanes: Int): Array[Array[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dim) { (j, i) =>
      digest.reset()
      val hex = digest.digest(s"plane$j:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 14), 16)
      (h % 1000000L) / 1000000.0 - 0.5
    }
  }

  def srpBucketJvm(vec: Array[Double], planes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) { dot += vec(i) * planes(j)(i); i += 1 }
      if (dot > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** LSH-bucketed approximate top-k: candidates score only against
    * queries sharing their SRP bucket. Same deterministic ranking as
    * brute force; recall trades against the candidate-set reduction.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, dim: Int,
      k: Int, numPlanes: Int = 8): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val planes = srpPlanes(dim, numPlanes)
    val qs = collectVecs(queries).map { case (id, v) => (id, v, srpBucketJvm(v, planes)) }
    val bc = spark.sparkContext.broadcast(qs)
    val scored = candidates.select("id", "vec").as[(Long, Array[Double])]
      .mapPartitions { it =>
        val planesL = srpPlanes(dim, numPlanes)
        val qsL = bc.value
        val qn = qsL.map(q => normJvm(q._2)) // hoisted once per task
        it.flatMap { case (cid, cv) =>
          val cb = srpBucketJvm(cv, planesL)
          val cvn = normJvm(cv)
          qsL.indices.iterator.collect { case j if qsL(j)._1 != cid && qsL(j)._3 == cb =>
            (qsL(j)._1, cid, round6(dotJvm(qsL(j)._2, cv) / (qn(j) * cvn)))
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    rankTopK(scored, k)
  }

  /** Scalar-quantized (SQ8) approximate top-k — the int8 compression
    * tier every production vector store ships (FAISS SQ8, Milvus,
    * pgvector int8): each vector L2-normalizes, every component
    * quantizes symmetrically to round(127·x̂) ∈ [−127, 127], and
    * candidate generation ranks by the EXACT-integer quantized dot
    * product (≈ 127²·cosine; SIMD-cheap at scale, 4× less memory
    * traffic than float32). Only the oversampled shortlist
    * (oversample·k per query) pays an exact float cosine rerank.
    *
    * Scale shape: quantized queries broadcast; the corpus scan emits
    * |queries| integer scores per candidate with NO pair enumeration
    * beyond the broadcast loop; the rerank joins the tiny shortlist
    * (broadcast) back to the vector table, so exact float math
    * touches oversample·k·|queries| rows only. Shortlist selection
    * tie-breaks on (iscore desc, neighbor_id asc) in exact integer
    * arithmetic — candidate sets are bit-reproducible on any engine,
    * which is what lets a SQL oracle replay the whole pipeline.
    *
    * Output: (query_id, rank, neighbor_id, cos) — top-k by
    * 6dp-rounded exact cosine over the SQ8 shortlist.
    */
  def sqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      oversample: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    // q_i = round(127 · x_i / ‖x‖) HALF_UP (away from zero, matching
    // SQL round on doubles) — the exact IEEE shape an oracle replays:
    // one norm, one multiply, one divide per component. Zero vectors
    // quantize to all-zero (iscore 0 against everything).
    def quant(v: Array[Double]): Array[Int] = {
      var ss = 0.0
      var i = 0
      while (i < v.length) { ss += v(i) * v(i); i += 1 }
      val norm = math.sqrt(ss)
      Array.tabulate(v.length) { j =>
        if (norm == 0.0) 0
        else new java.math.BigDecimal(127.0 * v(j) / norm)
          .setScale(0, java.math.RoundingMode.HALF_UP).intValueExact()
      }
    }
    val bcQ = spark.sparkContext.broadcast(
      collectVecs(queries).map { case (id, v) => (id, quant(v)) })
    val shortlist = candidates.select("id", "vec").as[(Long, Array[Double])]
      .mapPartitions { it =>
        it.flatMap { case (cid, cv) =>
          val qc = quant(cv)
          bcQ.value.iterator.collect { case (qid, qq) if qid != cid =>
            var s = 0L
            var i = 0
            while (i < qc.length) { s += qq(i).toLong * qc(i); i += 1 }
            (qid, cid, s)
          }
        }
      }
      // partition-local shortlist pruning (same exact order — integer
      // scores are ≤ 127²·dim ≪ 2⁵³, so the double-keyed heap is exact)
      .mapPartitions(it => partialTopK(
        it.map { case (q, id, s) => (q, id, s.toDouble) }, oversample * k)
        .map { case (q, id, s) => (q, id, s.toLong) })
      .toDF("query_id", "neighbor_id", "iscore")
    val wSl = Window.partitionBy(col("query_id"))
      .orderBy(col("iscore").desc, col("neighbor_id").asc)
    val cand = shortlist.withColumn("r", row_number().over(wSl))
      .filter(col("r") <= oversample * k)
      .select("query_id", "neighbor_id")
    // exact rerank, candidate-only: the shortlist (oversample·k rows
    // per query) broadcasts against the vector table
    val bqv = spark.sparkContext.broadcast(collectVecs(queries).toMap)
    val scored = broadcast(cand)
      .join(candidates.select(col("id").as("neighbor_id"), col("vec")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("vec"))
      .as[(Long, Long, Array[Double])]
      .mapPartitions { it =>
        val qv = bqv.value
        val qn = qv.map { case (id, v) => (id, normJvm(v)) } // hoisted once per task
        it.map { case (qid, cid, cv) =>
          (qid, cid, round6(dotJvm(qv(qid), cv) / (qn(qid) * normJvm(cv))))
        }
      }.toDF("query_id", "neighbor_id", "cos")
    rankTopK(scored, k)
  }

  /** k-NN classification over the embedding table: predict each query
    * vector's label as the majority label of its k nearest neighbors
    * (the [[bruteForceTopK]] ranking — 6dp-rounded cosine desc,
    * neighbor id asc), with ties on the vote count broken toward the
    * SMALLEST label. The label-transfer step of embedding-based data
    * curation (classify unlabeled corpus shards by their nearest
    * labeled anchors).
    *
    * `candidates` carries (id, vec, label); queries need only
    * (id, vec). Scale shape: queries broadcast (inherited from the
    * top-k kernel), the vote is two map-side-combinable aggregations
    * over k·|queries| rows.
    *
    * Output: (query_id, pred_label, votes).
    */
  def knnClassify(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val topk = bruteForceTopK(queries, candidates.select("id", "vec"), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("pred_label").asc)
    // the top-k side is k·|queries| rows BY CONTRACT — pin the
    // broadcast so a poor size estimate can never flip this into a
    // full-corpus sort-merge join on the label table
    broadcast(topk)
      .join(candidates.select(col("id").as("neighbor_id"), col("label").as("pred_label")),
        Seq("neighbor_id"))
      .groupBy(col("query_id"), col("pred_label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("pred_label"), col("votes"))
  }

  /** Deterministic k-means over (id, vec) rows — the shared coarse
    * quantizer of [[ivfTopK]] and [[semanticDedupPairs]]. Seeds are
    * the `nlist` vectors with the smallest md5(id) — a uniform
    * pseudo-random draw any engine replays, immune to id-order skew.
    * Each Lloyd round assigns every vector to its nearest centroid
    * partition-locally (tiny broadcast centroid table) and recomputes
    * centroids from EXACT integer micro-sums: values quantize to
    * round6(v)·1e6 longs, per-partition partials add associatively,
    * and the mean is one double division of exact integers — so the
    * centroids are bit-identical regardless of partitioning, executor
    * count, or engine (a SQL oracle replays them with BIGINT sums).
    * The per-round driver reduce handles ≤ nlist·numPartitions tiny
    * partial rows — the MLlib-style centroid update, not a data
    * collect. Returns (cluster id = seed's vector id, centroid),
    * sorted by id.
    */
  def kmeansCentroids(vectors: DataFrame, nlist: Int,
      lloydRounds: Int, metric: String = "cosine"): Array[(Long, Array[Double])] = {
    require(metric == "cosine" || metric == "l2",
      s"metric must be cosine or l2, got '$metric'")
    val spark = vectors.sparkSession
    import spark.implicits._
    val seeds = vectors
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(nlist)
    var cents: Array[(Long, Array[Double])] = collectVecs(seeds).sortBy(_._1)
    var round = 0
    while (round < lloydRounds) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = vectors.select("id", "vec").as[(Long, Array[Double])]
        .mapPartitions { it =>
          val cs = bc.value
          val cn = cs.map(c => normJvm(c._2)) // hoisted once per task
          val sums = scala.collection.mutable.LinkedHashMap.empty[Long, (Array[Long], Long)]
          it.foreach { case (_, v) =>
            val cid =
              if (metric == "l2") nearestCentroidsL2(cs, v, 1)(0)
              else cs(nearest1(cs, cn, v))._1
            val (acc, n) = sums.getOrElseUpdate(cid, (new Array[Long](v.length), 0L))
            var i = 0
            while (i < v.length) { acc(i) += Math.round(round6(v(i)) * 1e6); i += 1 }
            sums(cid) = (acc, n + 1)
          }
          sums.iterator.map { case (cid, (s, n)) => (cid, s, n) }
        }
        .collect() // ≤ nlist × numPartitions rows of micro-sum arrays
      bc.destroy() // superseded round's centroids are provably dead
      cents = partials.groupBy(_._1).map { case (cid, rows) =>
        val dim = rows.head._2.length
        val tot = new Array[Long](dim)
        var n = 0L
        rows.foreach { case (_, s, rn) =>
          var i = 0
          while (i < dim) { tot(i) += s(i); i += 1 }
          n += rn
        }
        // one exact-integer division per dim: same double everywhere
        (cid, Array.tabulate(dim)(i => tot(i).toDouble / (n * 1e6)))
      }.toArray.sortBy(_._1)
      round += 1
    }
    cents
  }

  /** IVF (inverted-file) approximate nearest neighbor: the
    * [[kmeansCentroids]] quantizer partitions the corpus into
    * inverted lists; each query probes only its `nprobe` nearest
    * lists, so the scored candidate set shrinks by ~nlist/nprobe
    * versus brute force. Assignment and probing rank by the
    * 6dp-rounded cosine with lowest-centroid-id tiebreak; final
    * ranking matches [[bruteForceTopK]] (rounded cosine desc,
    * neighbor id asc).
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nlist: Int = 8, nprobe: Int = 2, lloydRounds: Int = 3): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = kmeansCentroids(candidates, nlist, lloydRounds)
    val centsBc = spark.sparkContext.broadcast(cents)
    val qs = collectVecs(queries)
      .map { case (id, v) => (id, v, nearestCentroids(centsBc.value, v, nprobe).toSet) }
    val qsBc = spark.sparkContext.broadcast(qs)
    val scored = candidates.select("id", "vec").as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = centsBc.value
        val cn = cs.map(c => normJvm(c._2)) // hoisted once per task
        val qs = qsBc.value
        val qn = qs.map(q => normJvm(q._2)) // hoisted once per task
        it.flatMap { case (cid, cv) =>
          val list = cs(nearest1(cs, cn, cv))._1
          val cvn = normJvm(cv) // once per candidate, not once per query
          qs.indices.iterator.collect {
            case j if qs(j)._1 != cid && qs(j)._3(list) =>
              (qs(j)._1, cid, round6(dotJvm(qs(j)._2, cv) / (qn(j) * cvn)))
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    rankTopK(scored, k)
  }

  /** Ids of the `m` centroids nearest to `v`: 6dp-rounded cosine
    * desc, centroid id asc — the deterministic ranking every engine
    * reproduces.
    */
  private def nearestCentroids(cents: Array[(Long, Array[Double])],
      v: Array[Double], m: Int): Array[Long] =
    if (m == 1) {
      // allocation-free argmax fast path — this call sits inside the
      // per-row assignment loop of kmeans Lloyd rounds and the IVF
      // candidate scan (per-row sort + tuple array measured as real
      // task CPU at 1M rows); identical (cos desc, cid asc) ranking
      var bestCid = Long.MaxValue
      var bestCos = Double.NegativeInfinity
      var i = 0
      while (i < cents.length) {
        val c = round6(cosineJvm(v, cents(i)._2))
        if (c > bestCos || (c == bestCos && cents(i)._1 < bestCid)) {
          bestCos = c; bestCid = cents(i)._1
        }
        i += 1
      }
      Array(bestCid)
    } else cents
      .map { case (cid, cv) => (cid, round6(cosineJvm(v, cv))) }
      .sortBy { case (cid, c) => (-c, cid) }
      .take(m).map(_._1)

  /** L2 counterpart of [[nearestCentroids]]: 6dp-rounded squared
    * distance asc, centroid id tiebreak — PQ sub-quantizers assign by
    * L2 (cosine would drop sub-vector magnitudes and wreck the
    * reconstruction).
    */
  private def nearestCentroidsL2(cents: Array[(Long, Array[Double])],
      v: Array[Double], m: Int): Array[Long] =
    if (m == 1) {
      // same argmin fast path as [[nearestCentroids]] — hot in the PQ
      // per-row encode loop; identical (d2 asc, cid asc) ranking
      var bestCid = Long.MaxValue
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < cents.length) {
        val cv = cents(j)._2
        var d2 = 0.0
        var i = 0
        while (i < v.length) { val d = v(i) - cv(i); d2 += d * d; i += 1 }
        val r = round6(d2)
        if (r < bestD || (r == bestD && cents(j)._1 < bestCid)) {
          bestD = r; bestCid = cents(j)._1
        }
        j += 1
      }
      Array(bestCid)
    } else cents
      .map { case (cid, cv) =>
        var d2 = 0.0
        var i = 0
        while (i < v.length) { val d = v(i) - cv(i); d2 += d * d; i += 1 }
        (cid, round6(d2))
      }
      .sortBy { case (cid, d) => (d, cid) }
      .take(m).map(_._1)

  /** Product-quantization (PQ) approximate nearest neighbor — the
    * memory-compression member of the ANN family: each vector is
    * encoded as `m` sub-space centroid ids (m bytes at nlist ≤ 256
    * instead of 4·dim bytes of floats — a 32× cut at dim 64), and
    * queries score candidates against RECONSTRUCTIONS via per-subspace
    * lookup tables (the ADC — asymmetric distance computation — form:
    * per query, m × nlist partial dot products and squared norms are
    * precomputed once, so scoring a candidate is m table lookups, no
    * float vector access).
    *
    * Sub-quantizers are the shared deterministic [[kmeansCentroids]]
    * (md5-sampled seeds, integer micro-sum Lloyd rounds) run per
    * sub-space, so codes, reconstructions, and the final (rounded
    * cosine, id) ranking are bit-identical across runs and
    * partitionings — spec-verified along with a recall floor against
    * [[bruteForceTopK]]. Cosine variant: scores are cos(query,
    * reconstruction), consistent with the engine's other ANN ops.
    *
    * Scale shape: codebooks are m × nlist × (dim/m) doubles —
    * kilobytes, broadcast; encoding is one partition-local pass;
    * scoring touches only codes. Corpus vectors are never held in
    * executor memory beyond their m-byte codes.
    */
  def pqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      m: Int = 4, nlist: Int = 16, lloydRounds: Int = 2,
      rerank: Int = 32): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    require(nlist <= 256, s"nlist $nlist > 256 — codes must fit one byte each")
    // dims from the (already tiny, already collected) query side — no
    // extra job against the corpus; cosine needs equal dims anyway
    val qs = collectVecs(queries)
    require(qs.nonEmpty, "pqTopK needs at least one query vector")
    val dims = qs.head._2.length
    require(dims % m == 0, s"dim $dims not divisible by $m sub-spaces")
    val sub = dims / m

    // the training loop + encode pass read the corpus m·rounds times —
    // the one place reuse × upstream cost justifies a cache (the
    // cached projection is just (id, vec))
    val cands = candidates.select("id", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // per-subspace codebooks from the shared deterministic k-means,
    // trained and assigned by L2 (the PQ-standard metric — cosine
    // would drop sub-vector magnitudes and wreck reconstructions)
    val codebooks: Array[Array[(Long, Array[Double])]] =
      Array.tabulate(m) { j =>
        val subVecs = cands.select(col("id"),
          slice(col("vec"), j * sub + 1, sub).as("vec"))
        kmeansCentroids(subVecs, nlist, lloydRounds, metric = "l2")
      }
    val cbBc = spark.sparkContext.broadcast(codebooks)

    // encode candidates: m nearest-subcentroid POSITIONS, one byte
    // each — the genuine m-byte PQ code (positions index the sorted
    // codebook directly, so the ADC scan below is pure array access)
    val codes = cands.as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cb = cbBc.value
        val posOf: Array[Map[Long, Int]] =
          cb.map(_.iterator.map(_._1).zipWithIndex.toMap)
        it.map { case (id, v) =>
          val code = Array.tabulate(m) { j =>
            posOf(j)(nearestCentroidsL2(cb(j), v.slice(j * sub, (j + 1) * sub), 1)(0))
              .toByte
          }
          (id, code)
        }
      }.toDF("id", "code")
      // codes are the durable compressed index; materializing them
      // frees the full-vector cache
      .localCheckpoint(eager = true)
    cands.unpersist()

    // ADC: per query, flat per-position tables of partial dots and
    // squared centroid norms — scoring one candidate is m array reads
    val qsBc = spark.sparkContext.broadcast(qs)
    val scored = codes.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val cb = cbBc.value
        val queriesL = qsBc.value
        val nnTab = Array.tabulate(m)(j => cb(j).map { case (_, cv) =>
          var nn = 0.0; var i = 0
          while (i < sub) { nn += cv(i) * cv(i); i += 1 }
          nn
        })
        val tables = queriesL.map { case (_, qv) =>
          var qn = 0.0
          qv.foreach(x => qn += x * x)
          (math.sqrt(qn), Array.tabulate(m)(j => cb(j).map { case (_, cv) =>
            var dot = 0.0; var i = 0
            while (i < sub) { dot += qv(j * sub + i) * cv(i); i += 1 }
            dot
          }))
        }
        it.flatMap { case (cid, code) =>
          queriesL.iterator.zip(tables.iterator).collect {
            case ((qid, _), (qnorm, dotTab)) if qid != cid =>
              var dot = 0.0; var rn = 0.0
              var j = 0
              while (j < m) {
                val p = code(j) & 0xff
                dot += dotTab(j)(p); rn += nnTab(j)(p); j += 1
              }
              (qid, cid, round6(dot / (qnorm * math.sqrt(rn))))
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    // PQ-standard refinement: the ADC ranking shortlists
    // max(k, rerank) ids per query, and only THOSE rows' full vectors
    // are touched for an exact-cosine rerank — the recall recovery
    // step every production PQ deployment runs, preserving the
    // codes-only scan over the corpus
    val shortlist = rankTopK(scored, math.max(k, rerank))
      .select(col("query_id"), col("neighbor_id"))
    val exact = broadcast(shortlist)
      .join(candidates.select(col("id").as("neighbor_id"), col("vec")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("vec"))
      .as[(Long, Long, Array[Double])]
      .mapPartitions { it =>
        val queriesL = qsBc.value.toMap
        val qn = queriesL.map { case (id, v) => (id, normJvm(v)) } // once per task
        it.map { case (qid, cid, cv) =>
          (qid, cid, round6(dotJvm(queriesL(qid), cv) / (qn(qid) * normJvm(cv))))
        }
      }.toDF("query_id", "neighbor_id", "cos")
    rankTopK(exact, k)
  }

  /** SemDeDup-style semantic deduplication: k-means-cluster the
    * embeddings with the deterministic quantizer, then enumerate
    * near-duplicate pairs only WITHIN each cluster — the trick that
    * turns the O(n²) global pair space into nlist × O((n/nlist)²)
    * cluster-local spaces (size nlist ∝ corpus so clusters stay
    * bounded; SemDeDup runs 50k clusters at web scale). One shuffle
    * partitions vectors by cluster id; pairs never cross clusters,
    * so recall is bounded by cluster purity — the documented
    * SemDeDup trade. Output: (id_a, id_b, cos) with id_a < id_b,
    * 6dp-rounded cosine ≥ threshold, engine-replayable end-to-end
    * (centroids are bit-identical by construction).
    */
  def semanticDedupPairs(vectors: DataFrame, threshold: Double,
      nlist: Int = 8, lloydRounds: Int = 3): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val centsBc = spark.sparkContext.broadcast(
      kmeansCentroids(vectors, nlist, lloydRounds))
    // both sides of the self-join read the assignment — persist so the
    // corpus is scanned and assigned once, not once per side
    val assigned = vectors.select("id", "vec").as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = centsBc.value
        val cn = cs.map(c => normJvm(c._2)) // hoisted once per task
        it.map { case (id, v) => (id, v, cs(nearest1(cs, cn, v))._1) }
      }
      .toDF("id", "vec", "cluster")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = scorePairs(
      assigned.select(col("cluster"), col("id").as("id_a"), col("vec").as("va"))
        .join(assigned.select(col("cluster"), col("id").as("id_b"), col("vec").as("vb")),
          Seq("cluster"))
        .filter(col("id_a") < col("id_b")),
      threshold)
      // verified pairs only — tiny next to the assignment cache it frees
      .localCheckpoint(eager = true)
    assigned.unpersist()
    out
  }

  /** Embedding-space corpus clustering (the curation primitive behind
    * domain balancing, cluster-proportional sampling, and SemDeDup's
    * first stage, exposed as its own operator): every vector is
    * assigned to its nearest [[kmeansCentroids]] centroid and the
    * assignment is returned WITH its 6dp-rounded cosine and the
    * cluster's population. One pass assigns partition-locally against
    * the broadcast centroid table (kilobytes at any corpus size); the
    * single shuffle is the per-cluster count. Deterministic end to
    * end — the k-means is bit-identical across engines by
    * construction, so a SQL oracle replays the whole operator.
    * Output: (vec_id, cluster, cos, cluster_size) — cluster ids are
    * the seed vectors' ids.
    */
  def clusterAssign(vectors: DataFrame, nlist: Int = 8,
      lloydRounds: Int = 3): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val centsBc = spark.sparkContext.broadcast(
      kmeansCentroids(vectors, nlist, lloydRounds))
    val assigned = vectors.select("id", "vec").as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = centsBc.value
        val cn = cs.map(c => normJvm(c._2)) // hoisted once per task
        it.map { case (id, v) =>
          // nearest1 reproduces the (rounded cosine desc, cid asc)
          // ranking; the winner's rounded cosine is computed once
          val i = nearest1(cs, cn, v)
          (id, cs(i)._1,
            round6(dotJvm(v, cs(i)._2) / (normJvm(v) * cn(i))))
        }
      }
      .toDF("vec_id", "cluster", "cos")
    assigned.withColumn("cluster_size",
      count(lit(1)).over(Window.partitionBy(col("cluster"))).cast("long"))
  }

  /** Embedding outlier detection (the SemDeDup/D4 curation family's
    * "prune far-from-centroid points" step): every vector's cosine to
    * its assigned k-means centroid, flagged when it falls strictly
    * below the cluster's q-quantile of that cosine — a data-derived,
    * per-cluster cut, not a global hand-set threshold.
    *
    * Built from verified pieces: [[clusterAssign]]'s deterministic
    * quantizer (broadcast kilobyte centroids, linear assignment) and
    * [[Percentiles.twoPhaseDiscrete]] over the micro-quantized cosine
    * (cosines are round6, so ·1e6 is an exact integral — the
    * percentile runs on exact BIGINTs and the cut is engine-exact).
    * The quantile table is nlist rows, broadcast back; everything
    * else is the linear assignment pass.
    *
    * Output: (vec_id, cluster, cos_micro, p_micro, is_outlier).
    */
  def clusterOutliers(vectors: DataFrame, nlist: Int = 8,
      lloydRounds: Int = 3, q: Double = 0.10): DataFrame = {
    val assigned = clusterAssign(vectors, nlist, lloydRounds)
      .select(col("vec_id"), col("cluster"),
        round(col("cos") * 1e6).cast("long").as("cos_micro"))
    val cuts = Percentiles
      .twoPhaseDiscrete(assigned, groupCol = "cluster",
        valueCol = "cos_micro", qs = Seq(q))
      .select(col("cluster"), col("value").as("p_micro"))
    assigned.join(broadcast(cuts), Seq("cluster"))
      .select(col("vec_id"), col("cluster"), col("cos_micro"), col("p_micro"),
        (col("cos_micro") < col("p_micro")).as("is_outlier"))
  }

  /** MMR diversified re-ranking (Carbonell & Goldstein 1998): from
    * each query's dense top-`poolK` pool, greedily pick `k` results
    * maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) — the rerank a
    * retrieval pipeline runs so near-duplicate hits don't crowd the
    * result list.
    *
    * Scale shape: the pool is k rows per query (the upstream ANN pass
    * touches the corpus; this never does), so the greedy loop is a
    * per-query typed kernel over ≤ poolK vectors — one `mapGroups`
    * with poolK² JVM cosines per query, no cross-query state, no
    * driver involvement.
    *
    * Exactness: rel and pairwise sims are 6dp-rounded cosines in
    * micro units; the MMR score is the exact integer
    * `λmilli·rel_micro − (1000−λmilli)·sim_micro` (nano units), so
    * selection order and tie-breaks (score desc, id asc) are
    * engine-exact and an unrolled SQL replay agrees bit-for-bit.
    *
    * Output: (query_id, rank, doc_id, score_nano).
    */
  def mmrRerank(queries: DataFrame, candidates: DataFrame,
      poolK: Int = 8, k: Int = 5, lambdaMilli: Int = 700): DataFrame = {
    require(lambdaMilli >= 0 && lambdaMilli <= 1000, s"λ millis: $lambdaMilli")
    val spark = queries.sparkSession
    import spark.implicits._
    val pool = bruteForceTopK(queries, candidates, poolK)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos") * 1e6).cast("long").as("rel_micro"))
    val withVec = pool
      .join(candidates.select(col("id").as("neighbor_id"), col("vec")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("rel_micro"), col("vec"))
      .as[(Long, Long, Long, Array[Double])]
    val lam = lambdaMilli.toLong
    withVec.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val pool = it.toArray.sortBy { case (_, id, rel, _) => (-rel, id) }
        val n = pool.length
        val sim = Array.ofDim[Long](n, n)
        for (i <- 0 until n; j <- i + 1 until n) {
          val s = math.round(round6(cosineJvm(pool(i)._4, pool(j)._4)) * 1e6)
          sim(i)(j) = s; sim(j)(i) = s
        }
        val selected = Array.fill(n)(false)
        (1 to math.min(k, n)).iterator.map { rank =>
          var best = -1
          var bestScore = Long.MinValue
          for (c <- 0 until n if !selected(c)) {
            // true max over S (can be negative); the first pick has
            // no diversity term at all — pure relevance
            var maxSim = Long.MinValue
            for (s <- 0 until n if selected(s))
              if (sim(c)(s) > maxSim) maxSim = sim(c)(s)
            val score =
              if (maxSim == Long.MinValue) lam * pool(c)._3
              else lam * pool(c)._3 - (1000L - lam) * maxSim
            if (score > bestScore ||
              (score == bestScore && pool(c)._2 < pool(best)._2)) {
              best = c; bestScore = score
            }
          }
          selected(best) = true
          (qid, rank, pool(best)._2, bestScore)
        }
      }
      .toDF("query_id", "rank", "doc_id", "score_nano")
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup dedup),
    * brute-force form: a relational self theta-join — Spark broadcasts
    * the smaller build side itself (bounded by
    * autoBroadcastJoinThreshold), nothing is hand-collected to the
    * driver. Inherently O(n²) in pair count; it is the oracle /
    * verify kernel. Use [[nearDupPairsBucketed]] at corpus scale.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame =
    scorePairs(
      vectors.select(col("id").as("id_a"), col("vec").as("va"))
        .join(vectors.select(col("id").as("id_b"), col("vec").as("vb")),
          col("id_a") < col("id_b")),
      threshold)

  /** SRP-bucketed embedding near-dup — the scale path for
    * [[nearDupPairs]]: `numTables` independent SRP tables of
    * `numPlanes` hyperplanes each; vectors colliding in any table
    * become candidate pairs via a relational (table, bucket)
    * self-join — nothing is collected to the driver — and candidates
    * are verified with the exact cosine, so precision is always 1.
    * A pair at cosine t collides in one table with
    * p = (1 − acos(t)/π)^numPlanes, giving recall ≥
    * 1 − (1 − p)^numTables: size numPlanes to the threshold (tight
    * thresholds afford more planes → finer buckets → stronger
    * pruning) and numTables to the recall target. The DEFAULTS are
    * sized for real dedup thresholds (t ≥ 0.8): recall ≈ 0.996 at
    * t = 0.8 while an uncorrelated pair collides anywhere with only
    * ≈ 6% probability, so the candidate set stays ≪ n². Loose
    * thresholds (t ≈ 0.35) carry little angular signal — there
    * EVERY parameterization prunes weakly (e.g. 2 planes × 24
    * tables reaches recall ≈ 1 but admits most pairs); prefer the
    * brute-force form or a higher threshold at that operating point.
    */
  def nearDupPairsBucketed(vectors: DataFrame, threshold: Double,
      numPlanes: Int = 8, numTables: Int = 16): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val m = numPlanes
    val L = numTables
    val bucketed = vectors.select("id", "vec").as[(Long, Array[Double])]
      .mapPartitions { it =>
        var tables: Array[Array[Array[Double]]] = null
        it.flatMap { case (id, v) =>
          if (tables == null) {
            val planes = srpPlanes(v.length, m * L)
            tables = Array.tabulate(L)(t => planes.slice(t * m, t * m + m))
          }
          (0 until L).iterator.map(t => (id, t, srpBucketJvm(v, tables(t))))
        }
      }.toDF("id", "tbl", "bucket")
    val cand = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    scorePairs(
      cand
        .join(vectors.select(col("id").as("id_a"), col("vec").as("va")), "id_a")
        .join(vectors.select(col("id").as("id_b"), col("vec").as("vb")), "id_b"),
      threshold)
  }

  /** Exact-cosine verification of (id_a, id_b, va, vb) pair rows in a
    * typed JVM kernel; keeps only pairs at or above the threshold.
    * Precondition (all callers satisfy it — they join id → vec): a
    * given id always carries the same vector, so norms memoize per id.
    */
  private def scorePairs(pairs: DataFrame, threshold: Double): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("id_a"), col("id_b"), col("va"), col("vb"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .mapPartitions { it =>
        // Per-task norm memo: pair rows repeat each id once per
        // partner (every cluster-mate in semanticDedupPairs, every
        // colliding candidate in the bucketed path), so each distinct
        // id's norm accumulates once instead of once per pair.
        // dot/(na·nb) is bit-identical to cosineJvm — the same
        // additions in the same order, the same final expression.
        // Capacity-capped: a pathological partition clears the memo
        // instead of growing it without bound (norms just recompute).
        val norms = new java.util.HashMap[java.lang.Long, java.lang.Double](1 << 12)
        def normOf(id: Long, v: Array[Double]): Double = {
          val c = norms.get(id)
          if (c != null) c.doubleValue()
          else {
            if (norms.size >= (1 << 20)) norms.clear()
            val n = normJvm(v)
            norms.put(id, n)
            n
          }
        }
        it.map { case (a, b, va, vb) =>
          (a, b, round6(dotJvm(va, vb) / (normOf(a, va) * normOf(b, vb))))
        }
      }
      .toDF("id_a", "id_b", "cos")
      .filter(col("cos") >= threshold)
  }

  /** Population covariance matrix of an embedding column — the
    * statistics pass under PCA whitening, drift monitoring, and
    * feature-decorrelation reports. Emits the upper triangle as
    * (i, j, cov) rows, i ≤ j.
    *
    * Execution shape: each vector expands to its d(d+1)/2 upper-
    * triangle products via nested array lambdas (codegen'd, no UDF)
    * and ONE map-side-combinable hash aggregation reduces them to d²
    * rows; per-dimension means ride a second skinny aggregation and
    * join back broadcast. Nothing touches the driver and the only
    * exchanges carry ≤ d² rows — corpus cost is a single scan
    * regardless of row count. cov = E[xy] − E[x]E[y], evaluated
    * identically in any SQL replay.
    */
  /** Margin-based match mining (Artetxe & Schwenk 2019 — the
    * LASER/CCMatrix bitext-mining criterion): a raw cosine threshold
    * cannot separate a true match from a hub vector that is close to
    * EVERYTHING, so each pair's cosine is normalized by the mean of
    * both sides' k-NN cosines:
    *   margin(q, c) = cos(q, c) / ((avgTopK_q + avgTopK_c) / 2),
    * and each query keeps its best candidate by margin. Accepted
    * matches clear `minMargin` — the knob mining pipelines actually
    * tune.
    *
    * Determinism: cosines round to 6dp at the kernel (the s46
    * contract); top-k means sum the k sorted values left-to-right and
    * divide by k = 4 (a power of two — the division is exact in
    * IEEE), so both engines produce bit-identical margins.
    *
    * Scale shape: queries broadcast (the ANN contract — query sets
    * are small); the corpus side streams through one typed pass, and
    * both k-NN-mean tables aggregate from the SAME scored pass (one
    * persist, two map-side-combinable aggs). For corpus-scale BOTH
    * sides, bucket first (SRP/IVF) and feed the shortlist here.
    *
    * Output: (query_id, best_id, cos, margin, accepted), one row per
    * query.
    */
  def marginMining(queries: DataFrame, corpus: DataFrame,
      minMargin: Double = 1.02): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val k = 4 // fixed: the /k division must be exact (power of two)
    val bc = spark.sparkContext.broadcast(collectVecs(queries))
    val scored = corpus.select("id", "vec").as[(Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bc.value
        val qn = qs.map(q => normJvm(q._2)) // hoisted once per task
        it.flatMap { case (cid, cv) =>
          val cvn = normJvm(cv) // once per candidate, not once per query
          qs.indices.iterator.collect { case j if qs(j)._1 != cid =>
            (qs(j)._1, cid, round6(dotJvm(qs(j)._2, cv) / (qn(j) * cvn)))
          }
        }
      }.toDF("query_id", "cand_id", "cos")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def topKMean(keyCol: String, out: String): DataFrame = {
      val l = slice(reverse(array_sort(collect_list(col("cos")))), 1, k)
      scored.groupBy(col(keyCol))
        .agg(l.as("l"))
        .select(col(keyCol),
          ((element_at(col("l"), 1) + element_at(col("l"), 2) +
            element_at(col("l"), 3) + element_at(col("l"), 4)) / k).as(out))
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("margin").desc, col("cand_id").asc)
    val out = scored
      .join(topKMean("query_id", "qavg"), "query_id")
      .join(topKMean("cand_id", "cavg"), "cand_id")
      // an all-orthogonal pair has a zero normalizer — no signal on
      // either side, so the pair carries no margin (never a ÷0)
      .withColumn("margin",
        when((col("qavg") + col("cavg")) / 2 > 0,
          round(col("cos") / ((col("qavg") + col("cavg")) / 2), 6))
          .otherwise(lit(0.0)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("cand_id").as("best_id"), col("cos"),
        col("margin"), (col("margin") >= minMargin).as("accepted"))
      .localCheckpoint(eager = true)
    scored.unpersist()
    out
  }

  /** Partition-local Gram/sum/count sufficient statistics for the
    * covariance family: each task accumulates the upper-triangle
    * Gram matrix (d(d+1)/2 primitive doubles), per-dim sums and a
    * count over its vectors, then a `treeAggregate` merges d²-scale
    * arrays — per PARTITION on the wire, never per vector. The
    * naive alternative (explode d(d+1)/2 product structs per row
    * into a hash aggregate) generates ~3·10¹¹ rows for 1M vectors
    * at d=768 before partial aggregation can collapse anything — a
    * scale-killer this shape avoids by construction.
    */
  private[ops] def gramStats(vectors: DataFrame, vecCol: String)
      : (Array[Double], Array[Double], Long) = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val parts = vectors.select(asDouble(col(vecCol))).as[Array[Double]]
      .mapPartitions { it =>
        var gram: Array[Double] = null
        var sums: Array[Double] = null
        var d = 0
        var n = 0L
        while (it.hasNext) {
          val v = it.next()
          if (gram == null) {
            d = v.length
            gram = new Array[Double](d * (d + 1) / 2)
            sums = new Array[Double](d)
          }
          require(v.length == d,
            s"covariance over ragged vectors: ${v.length} != $d")
          var i = 0
          var t = 0
          while (i < d) {
            val xi = v(i)
            sums(i) += xi
            var j = i
            while (j < d) { gram(t) += xi * v(j); j += 1; t += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty else Iterator.single((gram, sums, n))
      }
    def merge(a: (Array[Double], Array[Double], Long),
        b: (Array[Double], Array[Double], Long)) = {
      if (a._1 == null) b
      else if (b._1 == null) a
      else {
        require(a._1.length == b._1.length,
          s"covariance over ragged partitions: ${a._1.length} != ${b._1.length}")
        var t = 0
        while (t < a._1.length) { a._1(t) += b._1(t); t += 1 }
        var i = 0
        while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
        (a._1, a._2, a._3 + b._3)
      }
    }
    parts.rdd.treeAggregate(
      (null: Array[Double], null: Array[Double], 0L))(merge, merge)
  }

  def covarianceMatrix(vectors: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val (gram, sums, n) = gramStats(vectors, vecCol)
    if (n == 0L)
      return Seq.empty[(Int, Int, Double)].toDF("i", "j", "cov")
    val d = sums.length
    val rows = Seq.newBuilder[(Int, Int, Double)]
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        rows += ((i, j, gram(t) / n - (sums(i) / n) * (sums(j) / n)))
        j += 1
        t += 1
      }
      i += 1
    }
    // d(d+1)/2 cells — metadata-scale; the heavy reduction already ran
    rows.result().toDF("i", "j", "cov")
  }

  /** PCA whitening: project embeddings onto the top-`k` principal
    * components and rescale each to unit variance — the
    * decorrelation step SemDeDup-style semantic pipelines run before
    * cosine thresholds mean anything. The d×d covariance reduces via
    * [[gramStats]]'s single-scan partition-local accumulation (d²
    * doubles to the driver — metadata, not data), eigendecomposes on
    * the driver with a deterministic cyclic Jacobi sweep, and the k×d
    * projection broadcasts back; the projection itself is one typed
    * pass.
    *
    * Output: (id, whitened array[k]). Components are sign-fixed
    * (largest-|loading| coordinate positive) so results are
    * deterministic across partitionings.
    */
  def pcaWhiten(vectors: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", eps: Double = 1e-9): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val (gram, sums, n) = gramStats(vectors, vecCol) // ONE scan: cov + means
    require(n > 0L, "pcaWhiten over an empty vector set")
    val d = sums.length
    require(k >= 1 && k <= d, s"k=$k outside 1..$d")
    val means = sums.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var ci = 0
    var ct = 0
    while (ci < d) {
      var cj = ci
      while (cj < d) {
        val c = gram(ct) / n - means(ci) * means(cj)
        cov(ci)(cj) = c
        cov(cj)(ci) = c
        cj += 1
        ct += 1
      }
      ci += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov) // descending
    // rows of `proj`: component c scaled by 1/sqrt(lambda_c)
    val proj = Array.tabulate(k, d) { (c, i) =>
      eigVecs(c)(i) / math.sqrt(math.max(eigVals(c), eps))
    }
    val projBc = spark.sparkContext.broadcast(proj)
    val muBc = spark.sparkContext.broadcast(means)
    vectors.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val p = projBc.value; val mu = muBc.value
        val out = new Array[Double](p.length)
        var c = 0
        while (c < p.length) {
          var acc = 0.0; var i = 0
          while (i < v.length) { acc += p(c)(i) * (v(i) - mu(i)); i += 1 }
          out(c) = acc; c += 1
        }
        (id, out)
      }
      .toDF("id", "whitened")
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix: (eigenvalues descending, matching eigenvectors as ROWS),
    * sign-fixed so the largest-|coordinate| entry is positive.
    * O(d³) per sweep on the driver — for the d ≤ a-few-hundred
    * embedding dims this is microseconds, and determinism (fixed
    * sweep order, fixed convergence bound) is what the engine's
    * replay guarantees require.
    */
  private[ops] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { c =>
      val row = Array.tabulate(d)(i => v(i)(c))
      val imax = row.indices.maxBy(i => (math.abs(row(i)), -i))
      if (row(imax) < 0) row.map(x => -x) else row
    }.toArray
    (vals, vecs)
  }
}
