package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** k-core-at-scale rehearsal: a 1M-vertex hash graph (4 out-edges
  * per vertex, mean undirected degree ≈ 8) plus a PLANTED 2000-node
  * community (16 intra-community edges per member, internal degree
  * ≈ 26) peeled at k = 12 by [[Graphs.kCore]]. Mean degree 8 is far
  * below the ~14.5 threshold where a random graph grows a 12-core,
  * so the random bulk must peel away over many cascade rounds and
  * the planted community must survive — the at-scale proof that the
  * iterative degree-peel loses nothing and halts.
  *
  * The check is EXACT against a single-node sequential peel over the
  * same hash edges (k-core is unique whatever the removal order, so
  * the round-synchronous distributed peel and the sequential
  * reference must land on the identical core): survivor count,
  * Σ id, Σ core-degree, plus planted-community containment. Only a
  * 3-long row leaves the cluster path.
  *
  * Lives in main so [[graft.Bench]] reports wall time per round
  * (`g_kcore1m`); `GraphsSpec` pins the semantics at spec sizes.
  */
object KcoreRehearsal {

  private def mix(i: Long): Long = graft.operators.CclRehearsal.mix(i)

  /** j-th random out-neighbor of vertex i (may self-loop or collide;
    * canonicalization dedups — both sides share the rule).
    */
  def bulkDst(i: Long, j: Int, n: Long, outDeg: Int): Long =
    math.floorMod(mix(i * outDeg + j), n)

  /** j-th intra-community partner of community member c. */
  def commDst(c: Long, j: Int, community: Long, commDeg: Int): Long =
    math.floorMod(mix(0x5EED0000L + c * commDeg + j), community)

  def run(spark: SparkSession, n: Long = 1000000L, outDeg: Int = 4,
      community: Long = 2000L, commDeg: Int = 16, k: Int = 12): Double = {
    import spark.implicits._
    val t0 = System.nanoTime()

    // distributed generation, one row per directed candidate edge
    val bulk = spark.range(n).flatMap { i =>
      (0 until outDeg).map(j => (i, bulkDst(i, j, n, outDeg)))
    }.toDF("src", "dst")
    val comm = spark.range(community).flatMap { c =>
      (0 until commDeg).map(j => (c, commDst(c, j, community, commDeg)))
    }.toDF("src", "dst")
    val core = Graphs.kCore(bulk.union(comm), k)
    val fp = core.agg(count(lit(1)).as("n_core"), sum(col("id")).as("sum_id"),
      sum(col("core_deg")).as("sum_deg")).collect().head
    val gotN = fp.getLong(0)
    val gotSumId = fp.getLong(1)
    val gotSumDeg = fp.getLong(2)
    val gotComm = core.filter(col("id") < community).count()

    // single-node reference: canonical undirected edges → CSR →
    // sequential peel (unique core regardless of order)
    val cand = new Array[Long]((n * outDeg + community * commDeg).toInt)
    var w = 0
    var i = 0L
    while (i < n) {
      var j = 0
      while (j < outDeg) {
        val d = bulkDst(i, j, n, outDeg)
        if (d != i) { val u = math.min(i, d); val v = math.max(i, d); cand(w) = u * n + v; w += 1 }
        j += 1
      }
      i += 1
    }
    var c = 0L
    while (c < community) {
      var j = 0
      while (j < commDeg) {
        val d = commDst(c, j, community, commDeg)
        if (d != c) { val u = math.min(c, d); val v = math.max(c, d); cand(w) = u * n + v; w += 1 }
        j += 1
      }
      c += 1
    }
    val keys = java.util.Arrays.copyOf(cand, w)
    java.util.Arrays.sort(keys)
    var m = 0
    i = 0
    while (i < keys.length) {
      if (i == 0 || keys(i.toInt) != keys(i.toInt - 1)) { keys(m) = keys(i.toInt); m += 1 }
      i += 1
    }
    val deg = new Array[Int](n.toInt)
    i = 0
    while (i < m) { deg((keys(i.toInt) / n).toInt) += 1; deg((keys(i.toInt) % n).toInt) += 1; i += 1 }
    val off = new Array[Int](n.toInt + 1)
    i = 0
    while (i < n) { off(i.toInt + 1) = off(i.toInt) + deg(i.toInt); i += 1 }
    val adj = new Array[Int](2 * m)
    val fill = java.util.Arrays.copyOf(off, off.length)
    i = 0
    while (i < m) {
      val u = (keys(i.toInt) / n).toInt; val v = (keys(i.toInt) % n).toInt
      adj(fill(u)) = v; fill(u) += 1
      adj(fill(v)) = u; fill(v) += 1
      i += 1
    }
    // sequential peel: queue everything below k, cascade
    val alive = new Array[Boolean](n.toInt)
    java.util.Arrays.fill(alive, true)
    val stack = new java.util.ArrayDeque[Integer](1 << 16)
    i = 0
    while (i < n) { if (deg(i.toInt) < k) { alive(i.toInt) = false; stack.push(i.toInt) }; i += 1 }
    while (!stack.isEmpty) {
      val u = stack.pop().intValue()
      var p = off(u)
      while (p < off(u + 1)) {
        val v = adj(p)
        if (alive(v)) {
          deg(v) -= 1
          if (deg(v) < k) { alive(v) = false; stack.push(v) }
        }
        p += 1
      }
    }
    var refN = 0L; var refSumId = 0L; var refSumDeg = 0L; var refComm = 0L
    i = 0
    while (i < n) {
      if (alive(i.toInt)) {
        refN += 1; refSumId += i
        refSumDeg += deg(i.toInt) // degree inside the core after peel
        if (i < community) refComm += 1
      }
      i += 1
    }

    require(gotN == refN, s"core size: got $gotN, want $refN")
    require(gotSumId == refSumId, s"Σ id: got $gotSumId, want $refSumId")
    require(gotSumDeg == refSumDeg, s"Σ core_deg: got $gotSumDeg, want $refSumDeg")
    require(gotComm == refComm, s"community survivors: got $gotComm, want $refComm")
    // structure sanity: the planted community dominates its own core
    require(refComm > community * 9 / 10,
      s"planted community did not survive: $refComm of $community")
    require(refN < n / 100, s"random bulk failed to peel: core $refN of $n")
    (System.nanoTime() - t0) / 1e9
  }
}
