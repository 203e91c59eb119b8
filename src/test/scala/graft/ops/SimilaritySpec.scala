package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"))

  test("round6 fast path is bit-identical to the BigDecimal reference") {
    def ref(x: Double): Double =
      if (x.isNaN) 0.0
      else new java.math.BigDecimal(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // adversarial boundary values: exact/near half-micro multiples,
    // signs, zeros, magnitudes around the fast-path guard
    val adversarial = Seq(
      0.0, -0.0, 1e-7, -1e-7, 4.9e-7, 5e-7, 5.1e-7, -4.9e-7, -5e-7, -5.1e-7,
      0.9999995, -0.9999995, 0.49999949999, 0.4999995, 0.50000049999,
      1.0000005, -1.0000005, 0.1234565, -0.1234565, 0.12345649999999,
      123.4567895, -123.4567895, 4.5e9, -4.5e9, 4.6e9, 1e12, -1e12,
      Double.MinPositiveValue, -Double.MinPositiveValue, Double.NaN,
      1.0 / 3.0, -1.0 / 3.0, math.Pi, -math.Pi)
    adversarial.foreach { x =>
      val got = Similarity.round6(x)
      val want = ref(x)
      assert(java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(want),
        s"round6($x) = $got != BigDecimal reference $want")
    }
    // randomized sweep over the cosine range and wider magnitudes,
    // including the unbounded squared-L2 regime (round6(d2) in
    // nearestCentroidsL2) where the guard band must scale with ulp:
    // boundary-straddling large values are generated EXACTLY at the
    // representable neighbors of half-micro multiples, the only
    // places a magnitude-blind band could misround
    val rng = new scala.util.Random(12345)
    (0 until 300000).foreach { _ =>
      val x = rng.nextInt(6) match {
        case 0 => rng.nextDouble() * 2 - 1                    // cosine range
        case 1 => (rng.nextInt(4000001) - 2000000) / 2e6      // half-micro grid
        case 2 => (rng.nextDouble() * 2 - 1) * 1e4            // larger scores
        case 3 => (rng.nextInt(2000001) - 1000000) / 1e6      // exact micro grid
        case 4 =>                                             // d2 regime, smooth
          rng.nextDouble() * math.pow(10, rng.nextInt(10))
        case _ =>                                             // d2 boundary-straddle
          val k = math.abs(rng.nextLong()) % 4503599627370496L // < 2⁵² micro units
          val b = (k + 0.5) / 1e6
          val s = if (rng.nextBoolean()) 1.0 else -1.0
          s * (if (rng.nextBoolean()) Math.nextUp(b) else Math.nextDown(b))
      }
      val got = Similarity.round6(x)
      val want = ref(x)
      assert(java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(want),
        s"round6($x) = $got != BigDecimal reference $want")
    }
  }

  test("cosine of a vector with itself is 1.0") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0, 2.0, 3.0))).toDF("id", "vec")
    val c = df.select(Similarity.cosine(col("vec"), col("vec"))).head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("brute-force top-k returns k ranked neighbors per query") {
    val k = 5
    val out = Similarity.bruteForceTopK(emb.filter(col("id") < 3), emb, k).collect()
    assert(out.length == 3 * k)
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to k))
      // ranks follow descending rounded cosine
      val cosines = sorted.map(_.getAs[Double]("cos"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH top-k neighbors are a subset of candidates with exact cosines") {
    // every (query, neighbor, cos) from LSH must appear in the
    // brute-force scored pairs with identical cosine (LSH only
    // restricts the candidate set, never alters scores)
    val brute = Similarity.bruteForceTopK(emb.filter(col("id") < 10), emb, 500)
      .select("query_id", "neighbor_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(emb.filter(col("id") < 10), emb, dim = 64, k = 5, numPlanes = 6)
      .collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(brute.contains(key) && brute(key) == r.getAs[Double]("cos"))
    }
  }

  test("clusterAssign: total population, deterministic across partitioning, " +
      "agrees with the shared quantizer") {
    val n = emb.count()
    val out = Similarity.clusterAssign(emb, nlist = 8, lloydRounds = 3)
    val rows = out.collect()
    assert(rows.length == n, "every vector gets exactly one cluster")
    // cluster_size is the true population of its cluster
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    assert(byCluster.size <= 8)
    byCluster.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("cluster_size")).distinct.toSeq == Seq(rs.length.toLong))
    }
    // repartitioning must not move a single assignment (bit-identical
    // centroids by construction)
    val re = Similarity.clusterAssign(emb.repartition(17), nlist = 8, lloydRounds = 3)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      re.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
    // the winning cosine really is the max over the trained centroids
    val cents = Similarity.kmeansCentroids(emb, 8, 3)
    val vecs = emb.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[scala.collection.Seq[Double]]("vec").toArray).toMap
    rows.take(50).foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      val best = cents.map { case (cid, cv) =>
        (cid, Similarity.round6(Similarity.cosineJvm(v, cv)))
      }.minBy { case (cid, c) => (-c, cid) }
      assert(best._1 == r.getAs[Long]("cluster") && best._2 == r.getAs[Double]("cos"))
    }
  }

  test("IVF with k-means quantizer: deterministic across runs, recall@5 above floor") {
    val queries = emb.filter(col("id") % 100 === 0)
    def run() = Similarity.ivfTopK(queries, emb, k = 5, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val a = run()
    assert(a == run(), "k-means centroids must be run-to-run deterministic")
    // recall@5 vs brute force: nprobe=2 of nlist=8 scans ~1/4 of the
    // corpus, and the synthetic embeddings are near-uniform (little
    // cluster structure to exploit), so a degenerate quantizer would
    // sit at the ~0.25 scan fraction. Lloyd-converged centroids
    // measure 0.44 here; the floor splits the difference so seeding
    // regressions (e.g. near-identical seeds) fail loudly without
    // flaking on data refreshes
    val brute = Similarity.bruteForceTopK(queries, emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = a.map { case (q, _, n, _) => (q, n) }
    val recall = brute.count(got.contains).toDouble / brute.size
    assert(recall >= 0.35, s"recall@5 $recall below floor")
  }

  test("semantic dedup pairs are cluster-local brute-force pairs with exact cosines") {
    val sub = emb.filter(col("id") < 200)
    val all = Similarity.nearDupPairs(sub, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sem = Similarity.semanticDedupPairs(sub, 0.3).collect()
    assert(sem.nonEmpty)
    // every semantic pair appears in the global set with the same
    // cosine (clustering only restricts candidates, never rescores)
    sem.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(all.contains(key) && all(key) == r.getDouble(2), key)
    }
    assert(sem.length <= all.size)
  }

  test("near-dup pairs are symmetric-free and above threshold") {
    val pairs = Similarity.nearDupPairs(emb.filter(col("id") < 100), 0.3).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cos") >= 0.3)
    }
  }

  test("PQ top-k: deterministic, code-compressed, recall above floor") {
    val queries = emb.filter(col("id") < 5)
    // unclustered random embeddings are PQ's hardest case — size the
    // codebooks up (8 sub-spaces × 32 centroids) and lean on the
    // exact rerank for recall, exactly as a production deployment
    // tunes the same knobs
    val a = Similarity.pqTopK(queries, emb, k = 5,
        m = 8, nlist = 32, lloydRounds = 3, rerank = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // bit-identical across runs and partitionings (deterministic
    // codebooks + ADC tables)
    val b = Similarity.pqTopK(queries, emb.repartition(7), k = 5,
        m = 8, nlist = 32, lloydRounds = 3, rerank = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(a.sorted.toSeq == b.sorted.toSeq)
    assert(a.length == 5 * 5)
    // approximate-but-useful: recall@5 of the reconstruction ranking
    val brute = Similarity.bruteForceTopK(queries, emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = a.map { case (q, _, n, _) => (q, n) }.toSet
    val recall = brute.count(got.contains).toDouble / brute.size
    assert(recall >= 0.3, s"recall@5 $recall below floor")
  }

  test("knnClassify takes the majority label of the brute-force top-k") {
    import spark.implicits._
    import graft.Tables
    val labeled = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("vec"), col("label"))
    val queries = labeled.filter(col("id") < 5).select("id", "vec")
    val got = Similarity.knnClassify(queries, labeled, k = 7).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // recompute expectation from the shared top-k kernel + label join
    val labels = labeled.select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val topk = Similarity.bruteForceTopK(queries, labeled.select("id", "vec"), 7)
      .collect().groupBy(_.getLong(0))
    topk.foreach { case (qid, rows) =>
      val votes = rows.map(r => labels(r.getAs[Long]("neighbor_id")))
        .groupBy(identity).map { case (l, v) => (l, v.size) }
      val best = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
      assert(got(qid) == (best._1, best._2.toLong), s"query $qid")
    }
  }

  test("clusterOutliers: cut is the per-cluster p10, invariant to partitioning") {
    val vecs = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"))
    val out = Similarity.clusterOutliers(vecs, nlist = 8, lloydRounds = 3, q = 0.10)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // flagged = strictly below the cluster cut, and at most ~10% per cluster
    out.groupBy(_._1).foreach { case (cid, rows) =>
      val cut = rows.head._4
      assert(rows.forall(_._4 == cut), s"cluster $cid: one cut per cluster")
      rows.foreach { case (_, id, cm, p, flag) =>
        assert(flag == (cm < p), s"vec $id flag mismatch") }
      val nFlag = rows.count(_._5)
      assert(nFlag <= math.ceil(0.10 * rows.size),
        s"cluster $cid flagged $nFlag of ${rows.size}")
      // the cut is an actual data value of the cluster (discrete percentile)
      assert(rows.exists(_._3 == cut), s"cluster $cid cut not a member value")
    }
    val repartitioned = Similarity.clusterOutliers(vecs.repartition(13),
        nlist = 8, lloydRounds = 3, q = 0.10)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.toSet == repartitioned.toSet, "partitioning must not change flags")
  }

  test("mmrRerank demotes the near-duplicate of an already-selected hit") {
    import spark.implicits._
    // candidates 10 and 11 are near-identical (cos ≈ 0.99994), 12 is
    // orthogonal with zero relevance. Pure relevance ranks 10,11,12;
    // MMR at λ=0.5 must slot the orthogonal doc ahead of the clone.
    val queries = Seq((1L, Array(1.0, 0.0, 0.0))).toDF("id", "vec")
    val cands = Seq(
      (10L, Array(1.0, 0.05, 0.0)),
      (11L, Array(1.0, 0.06, 0.0)),
      (12L, Array(0.0, 0.0, 1.0)))
      .toDF("id", "vec")
    val got = Similarity.mmrRerank(queries, cands, poolK = 3, k = 3,
        lambdaMilli = 500)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 10L), (2, 12L), (3, 11L)), got.mkString(","))
    // pure relevance (λ=1000) keeps the similarity-blind order
    val rel = Similarity.mmrRerank(queries, cands, poolK = 3, k = 3,
        lambdaMilli = 1000)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(rel.toSeq == Seq((1, 10L), (2, 11L), (3, 12L)), rel.mkString(","))
  }

  test("jacobiEigen: orthonormal eigenvectors reconstruct the matrix") {
    val r = new scala.util.Random(5)
    val d = 8
    val b = Array.fill(d, d)(r.nextGaussian())
    // symmetric PSD-ish: B^T B
    val m = Array.tabulate(d, d)((i, j) => (0 until d).map(k => b(k)(i) * b(k)(j)).sum)
    val (vals, vecs) = Similarity.jacobiEigen(m)
    // descending
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // orthonormal rows
    for (a <- 0 until d; c <- 0 until d) {
      val dot = (0 until d).map(i => vecs(a)(i) * vecs(c)(i)).sum
      assert(math.abs(dot - (if (a == c) 1.0 else 0.0)) < 1e-8, s"dot($a,$c)=$dot")
    }
    // reconstruction: m = sum_c lambda_c v_c v_c^T
    for (i <- 0 until d; j <- 0 until d) {
      val rec = (0 until d).map(c => vals(c) * vecs(c)(i) * vecs(c)(j)).sum
      assert(math.abs(rec - m(i)(j)) < 1e-8, s"m($i)($j): $rec vs ${m(i)(j)}")
    }
  }

  test("covarianceMatrix equals the serial covariance; pcaWhiten decorrelates") {
    import spark.implicits._
    val r = new scala.util.Random(11)
    val n = 400; val d = 6
    // correlated data: x2 ~ 2*x0 + noise
    val rows = (0 until n).map { i =>
      val base = Array.fill(d)(r.nextGaussian().toFloat)
      base(2) = (2.0f * base(0)) + 0.1f * r.nextGaussian().toFloat
      (i.toLong, base.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = Similarity.covarianceMatrix(df).collect()
      .map(x => (x.getAs[Int]("i"), x.getAs[Int]("j")) -> x.getAs[Double]("cov")).toMap
    // serial reference
    val data = rows.map(_._2.map(_.toDouble).toArray)
    val mu = Array.tabulate(d)(i => data.map(_(i)).sum / n)
    for (i <- 0 until d; j <- i until d) {
      val ref = data.map(v => v(i) * v(j)).sum / n - mu(i) * mu(j)
      assert(math.abs(got((i, j)) - ref) < 1e-9, s"cov($i,$j)")
    }
    // whiten to k=3 and check the output covariance is the identity
    val w = Similarity.pcaWhiten(df, k = 3)
    val wcov = Similarity.covarianceMatrix(w, idCol = "id", vecCol = "whitened")
      .collect().map(x => (x.getAs[Int]("i"), x.getAs[Int]("j")) -> x.getAs[Double]("cov")).toMap
    for (i <- 0 until 3; j <- i until 3)
      assert(math.abs(wcov((i, j)) - (if (i == j) 1.0 else 0.0)) < 1e-6,
        s"whitened cov($i,$j)=${wcov((i, j))}")
  }

  test("SQ8 top-k: exact cosines on returned pairs, recall@5 above floor, " +
      "deterministic across partitioning") {
    val e = emb
    val q = e.filter(col("id") < 10)
    val sq = Similarity.sqTopK(q, e, k = 5).collect()
    assert(sq.length == 10 * 5)
    val bf = Similarity.bruteForceTopK(q, e, k = 5).collect()
    val bfCos = bf.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
      r.getAs[Double]("cos")).toMap
    // exact-rerank contract: any (q, n) the SQ8 path returns that brute
    // force also ranked must carry the identical 6dp cosine
    val bfAll = Similarity.bruteForceTopK(q, e, k = 50).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos")).toMap
    sq.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      bfAll.get(key).foreach(c => assert(c == r.getAs[Double]("cos"), s"cos mismatch at $key"))
    }
    // 8-bit quantization at 64 dims is nearly lossless: recall@5 vs
    // exact should be high (the 4x oversampled rerank fixes ranking)
    val sqSet = sq.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val bfSet = bfCos.keySet
    val recall = sqSet.intersect(bfSet).size.toDouble / bfSet.size
    assert(recall >= 0.9, s"SQ8 recall@5 = $recall")
    // partition-invariance: same result from a repartitioned corpus
    val sq2 = Similarity.sqTopK(q, e.repartition(7), k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSet
    val sq1 = sq.map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
      r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSet
    assert(sq1 == sq2)
  }

  test("marginMining demotes the hub a raw-cosine argmax would pick") {
    import spark.implicits._
    def basis(i: Int, s: Double = 1.0): Array[Double] = {
      val v = Array.fill(8)(0.0); v(i) = s; v
    }
    // queries: 5 orthogonal basis vectors (cand-side top-4 needs ≥ 4)
    val queries = (0 until 5).map(i => (i.toLong, basis(i)))
      .toDF("id", "vec")
    // A: the true match for q0 — cos(q0, A) = 0.8, invisible to others.
    // H: a hub — cos(q0, H) ≈ 0.866 BEATS A on raw cosine, but H is
    // also close to q1..q3, so margin normalization must demote it.
    val a = Array(0.8, 0, 0, 0, 0, 0.6, 0, 0)
    val h = Array(0.9, 0.3, 0.3, 0.3, 0, 0, 0, 0)
    val cands = Seq(100L -> a, 101L -> h,
      102L -> basis(6), 103L -> basis(7)).toDF("id", "vec")
    val out = Similarity.marginMining(queries, cands).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    val q0 = out(0L)
    // raw-cosine sanity: the hub really is the naive winner
    assert(Similarity.cosineJvm(basis(0), h) > Similarity.cosineJvm(basis(0), a))
    assert(q0.getAs[Long]("best_id") == 100L,
      s"margin must pick the true match, got ${q0.getAs[Long]("best_id")}")
    assert(q0.getAs[Boolean]("accepted"))
    assert(out.size == 5, "one row per query")
    // determinism across partitioning
    val again = Similarity.marginMining(queries.repartition(3),
        cands.repartition(2)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("best_id"),
        r.getAs[Double]("margin"))).toSet
    assert(again == out.values.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("best_id"), r.getAs[Double]("margin"))).toSet)
  }

  test("diversityTopK: per-group cap binds before the global top-k") {
    import spark.implicits._
    // query along e1; group 7 has THREE best-aligned candidates but
    // only 2 may survive; group 8's worse candidate must take slot 3
    val q = Seq((100L, Array(1.0, 0.0))).toDF("id", "vec")
    val c = Seq(
      (1L, Array(1.0, 0.01), 7L), (2L, Array(1.0, 0.02), 7L),
      (3L, Array(1.0, 0.03), 7L), (4L, Array(1.0, 9.0), 8L))
      .toDF("id", "vec", "label")
    val got = Similarity.diversityTopK(q, c, "label", k = 3, perGroup = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, 1L, 7L), (2, 2L, 7L), (3, 4L, 8L)))
    intercept[IllegalArgumentException](
      Similarity.diversityTopK(q, c, "label", k = 0, perGroup = 1))
  }
}
