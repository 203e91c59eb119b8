package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Covariance-at-scale rehearsal (`s_cov1m`): a million vectors at a
  * production embedding dimension (d=256) through
  * [[Similarity.gramStats]] / [[Similarity.covarianceMatrix]] and
  * [[Similarity.pcaWhiten]] — the regime where the former
  * explode-based plan generated d(d+1)/2 struct rows PER VECTOR
  * (~3·10¹⁰ at this size) and could not finish. The partition-local
  * Gram accumulation does 1M·d²/2 multiply-adds inside tasks and
  * ships d² doubles per partition, so it lands in seconds.
  *
  * Planted structure, exactly recovered or the run throws:
  *   - dims pair up: x[2m+1] = ρ·x[2m] + (1−ρ)·ε, all other entries
  *     independent — so cov(2m, 2m+1) = ρ·var(x[2m]), cross-pair
  *     covariance ≈ 0, and the diagonal sits at the analytic uniform
  *     variance. With n=1M the sampling error is ~1e-3, checked at
  *     ±0.01;
  *   - pcaWhiten(k=8) output re-measured through the same covariance
  *     path must be decorrelated unit-variance (identity up to ±0.05)
  *     — the whiten contract at scale, not just at the 500-row gate.
  *
  * Everything derives from splitmix64 arithmetic: any executor
  * regenerates any row, no driver data, bit-for-bit reproducible.
  */
object CovRehearsal {

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** hash → double in [-1, 1) with millionths resolution. */
  private def unit(h: Long): Double =
    (java.lang.Math.floorMod(h, 2000000L) - 1000000L) / 1e6

  /** Deterministic corpus with paired-dimension correlation ρ. */
  def synth(spark: SparkSession, n: Long, dim: Int, rho: Double): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions(_.map { id =>
      val base = Array.tabulate(dim)(j => unit(splitmix64(id * 2654435761L + j)))
      val v = Array.tabulate(dim) { j =>
        if (j % 2 == 1) rho * base(j - 1) + (1 - rho) * base(j) else base(j)
      }
      (id, v)
    }).toDF("id", "vec")
  }

  def run(spark: SparkSession, n: Long = 1000000L, dim: Int = 256,
      rho: Double = 0.5, k: Int = 8): Double = {
    val t0 = System.nanoTime()
    // uniform[-1,1) at millionths resolution: var = 1/3 (to ~1e-12)
    val varU = 1.0 / 3.0
    val cov = Similarity.covarianceMatrix(synth(spark, n, dim, rho), "id", "vec")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    require(cov.size == dim * (dim + 1) / 2,
      s"covariance triangle has ${cov.size} cells, want ${dim * (dim + 1) / 2}")
    def near(got: Double, want: Double, tol: Double, what: String): Unit =
      require(math.abs(got - want) <= tol,
        f"$what: got $got%.4f want $want%.4f (±$tol)")
    var m = 0
    while (m < dim / 2) {
      val e = 2 * m
      near(cov((e, e)), varU, 0.01, s"var($e)")
      near(cov((e, e + 1)), rho * varU, 0.01, s"planted cov($e,${e + 1})")
      near(cov((e + 1, e + 1)), (rho * rho + (1 - rho) * (1 - rho)) * varU,
        0.01, s"var(${e + 1})")
      if (e + 2 < dim) near(cov((e, e + 2)), 0.0, 0.01, s"cross-pair cov($e,${e + 2})")
      m += 1
    }
    // whiten contract at scale: k components, re-measured covariance
    // of the whitened output is the identity
    val white = Similarity.pcaWhiten(synth(spark, n, dim, rho), k,
      idCol = "id", vecCol = "vec")
    val wcov = Similarity.covarianceMatrix(white, "id", "whitened")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    require(wcov.size == k * (k + 1) / 2, s"whitened triangle ${wcov.size}")
    wcov.foreach { case ((i, j), c) =>
      near(c, if (i == j) 1.0 else 0.0, 0.05, s"whitened cov($i,$j)")
    }
    (System.nanoTime() - t0) / 1e9
  }
}
