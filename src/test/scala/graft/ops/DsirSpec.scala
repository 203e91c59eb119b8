package graft.ops

import graft.SparkSpec

class DsirSpec extends SparkSpec {

  // 64 buckets keeps the six test words collision-free (verified:
  // alpha/beta/gamma/delta/epsilon/zeta land in 6 distinct bins), so
  // the sign assertions below reflect the smoothed ratios, not
  // hash-collision noise
  private val buckets = 64

  /** The operator's bucket function, reimplemented independently. */
  private def bucket(w: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
    val hex = md.take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % buckets).toInt
  }

  private def microWeight(ct: Long, cr: Long, tTgt: Long, tRaw: Long): Long = {
    val x = math.log((ct + 1.0) * (tRaw + buckets.toDouble)
      / ((tTgt + buckets.toDouble) * (cr + 1.0)))
    new java.math.BigDecimal(Similarity.round6(x) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
  }

  test("importance weights match an in-memory reference and separate " +
      "target-like from pool-like documents") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "alpha beta alpha gamma", "tgt"),
      (1L, "beta alpha beta beta", "tgt"),
      (2L, "delta epsilon zeta delta", "web"),
      (3L, "epsilon zeta zeta delta epsilon", "web"),
      (4L, "alpha beta gamma alpha", "web"),   // target-like text in the pool
      (5L, "delta zeta epsilon", "web"))
    val df = corpus.toDF("doc_id", "text", "source")

    // independent reference: bucket histograms → smoothed log ratios
    val toks = corpus.map { case (id, t, s) =>
      (id, s, t.split(" ").filter(_.nonEmpty).map(bucket)) }
    val tgtCounts = toks.filter(_._2 == "tgt").flatMap(_._3)
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val rawCounts = toks.filter(_._2 != "tgt").flatMap(_._3)
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val tTgt = tgtCounts.values.sum
    val tRaw = rawCounts.values.sum
    val expected = toks.map { case (id, _, bs) =>
      val logwMicro = bs.map { b =>
        microWeight(tgtCounts.getOrElse(b, 0L), rawCounts.getOrElse(b, 0L),
          tTgt, tRaw)
      }.sum
      id -> ((bs.length.toLong, logwMicro))
    }.toMap

    val out = Dsir.importanceWeights(df, targetSource = "tgt", buckets = buckets)
      .collect()
    assert(out.length == corpus.length)
    out.foreach { r =>
      val (nTok, micro) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") == nTok)
      assert(r.getAs[Long]("logw_micro") == micro,
        s"doc ${r.getAs[Long]("doc_id")}: got ${r.getAs[Long]("logw_micro")}, want $micro")
      assert(r.getAs[Double]("logw") == micro.toDouble / 1e6)
      assert(r.getAs[Boolean]("keep") == micro > 0)
    }
    // the whole point of DSIR: target-vocabulary docs outrank
    // pool-vocabulary docs, including the target-like doc hiding in
    // the pool
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logw_micro")).toMap
    assert(byId(0L) > 0 && byId(1L) > 0 && byId(4L) > 0)
    assert(byId(2L) < 0 && byId(3L) < 0 && byId(5L) < 0)
  }

  test("weights are invariant to input partitioning") {
    import spark.implicits._
    val docs = (0L until 60L).map { i =>
      val w = if (i % 3 == 0) "spark scale shuffle join" else "cat dog fish bird"
      (i, s"$w token$i", if (i < 10) "tgt" else "web")
    }.toDF("doc_id", "text", "source")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.importanceWeights(df, "tgt", buckets = buckets).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(docs) == run(docs.repartition(13)))
  }
}
