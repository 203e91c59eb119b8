package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring over edge tables — the crawl-frontier
  * prioritization family (PageRank is what seed-quality /
  * harmonic-centrality corpus weights like CommonCrawl's are built
  * from). Complements the engine's existing graph surface
  * ([[TextDedup.connectedComponents]] / [[UnionFind]]), which settles
  * membership; this settles IMPORTANCE.
  *
  * All arithmetic is exact integers in micro units with floor
  * division at every step, so a fixed iteration count is
  * bit-reproducible on any engine — an oracle unrolls the same
  * iterations in SQL and must match hash-exactly. (Float PageRank
  * converges to the same ranking but not the same bits; a
  * correctness gate needs the bits.)
  *
  * Scale shape per iteration: one join of the rank table onto the
  * edge list (rank rows are |V|, edges |E|) and one dst-key
  * aggregation — the textbook message-passing round, one shuffle
  * class per iteration, no driver state. Out-degrees compute once.
  * Lineage is truncated every iteration via `localCheckpoint` so a
  * deep iteration count cannot stack plans.
  */
object Graphs {

  /** Fixed-iteration integer PageRank. `edges`: (src, dst) — parallel
    * edges count once (deduplicated), self-loops dropped. `vertices`:
    * one `id` column, the rank domain (isolated vertices keep the
    * teleport mass). Damping in milli (850 = 0.85).
    *
    * rank_0 = 10⁶; rank_{k+1}(v) = (1000−d)·10⁶ div 1000
    *   + d · Σ_{u→v} (rank_k(u) div outdeg(u)) div 1000.
    *
    * Output: (id, rank_micro) after `iters` rounds.
    */
  def pageRank(edges: DataFrame, vertices: DataFrame, iters: Int = 3,
      dampingMilli: Long = 850L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters $iters out of [1, 50]")
    require(dampingMilli >= 0 && dampingMilli <= 1000,
      s"dampingMilli $dampingMilli out of [0, 1000]")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val teleport = (1000L - dampingMilli) * 1000000L / 1000L
    var rank = vertices.select(col("id").cast("long").as("id"),
      lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      val contrib = e.join(rank, e("src") === rank("id"))
        .join(outDeg, "src")
        .select(col("dst").as("id"),
          expr("rank_micro div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      rank = vertices.select(col("id").cast("long").as("id"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr(s"($dampingMilli * coalesce(s, 0)) div 1000")).as("rank_micro"))
        // truncate lineage so iteration depth never stacks plans
        .localCheckpoint(eager = true)
    }
    e.unpersist()
    rank
  }

  /** Fixed-iteration integer HITS (Kleinberg 1999) — the hub/
    * authority split PageRank's single score cannot express: a
    * link-farm hub page points at many authorities but IS not one.
    * Scores normalize by the round's MAXIMUM (top score = 10⁶) in
    * exact floor division — max-normalization keeps everything
    * integral, where the classical L2 norm would force floats.
    *
    * Per half-round: one score-onto-edges join + one key aggregation
    * + one scalar max (broadcast back) — the same message-passing
    * shuffle class as [[pageRank]]; lineage truncated per round.
    *
    * Output: (id, hub_micro, auth_micro) after `iters` rounds;
    * vertices with no outgoing (resp. incoming) edges score 0.
    */
  def hits(edges: DataFrame, vertices: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters $iters out of [1, 50]")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = vertices.select(col("id").cast("long").as("id"))
    var auth = verts.select(col("id"), lit(1000000L).as("score"))
    var hub = auth
    def halfRound(scores: DataFrame, joinOn: String, outBy: String): DataFrame = {
      val raw = e.join(scores, e(joinOn) === scores("id"))
        .groupBy(col(outBy).as("id")).agg(sum(col("score")).as("raw"))
      val mx = raw.agg(max(col("raw")).as("m"))
      verts.join(raw, Seq("id"), "left").crossJoin(broadcast(mx))
        .select(col("id"),
          coalesce(expr("(raw * 1000000) div m"), lit(0L)).as("score"))
        .localCheckpoint(eager = true)
    }
    for (_ <- 1 to iters) {
      hub = halfRound(auth, joinOn = "dst", outBy = "src")
      auth = halfRound(hub, joinOn = "src", outBy = "dst")
    }
    val out = hub.select(col("id"), col("score").as("hub_micro"))
      .join(auth.select(col("id"), col("score").as("auth_micro")), "id")
    e.unpersist()
    out
  }

  /** Exact per-vertex triangle counts via degree-ordered orientation
    * (Chiba–Nishizeki / the MapReduce "graph twiddling" form): every
    * undirected edge points from its lower-(degree, id) endpoint to
    * the higher, so each triangle {x < y < z} materializes exactly
    * once — as the wedge (x→y, x→z) closed by the oriented edge y→z —
    * and wedge fan-out per vertex is bounded by its OUT-degree under
    * the orientation, which is O(√m) on any graph. Total work is the
    * optimal O(m^1.5): two self-equi-joins of the oriented edge table
    * (wedge build + closure probe), never an unoriented neighborhood
    * product, which a skewed hub vertex would blow up quadratically.
    *
    * Ties cannot occur: the order key is degree·2³² + id and ids are
    * distinct. Output: (id, triangles) for vertices in ≥ 1 triangle.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val und = edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("u"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .persist(lvl)
    val deg = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val o = und
      .join(deg.select(col("id").as("u"), col("deg").as("degu")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("degv")), Seq("v"))
      .select(col("u"), col("v"),
        (col("degu") * lit(4294967296L) + col("u")).as("ku"),
        (col("degv") * lit(4294967296L) + col("v")).as("kv"))
      .select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("s"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("t"),
        greatest(col("ku"), col("kv")).as("tk"))
      .persist(lvl)
    val tri = o.as("a").join(o.as("b"),
        col("a.s") === col("b.s") && col("a.tk") < col("b.tk"))
      .select(col("a.t").as("x0"), col("b.t").as("y0"), col("a.s").as("apex"))
      .join(o.as("c"), col("c.s") === col("x0") && col("c.t") === col("y0"))
      .select(col("apex"), col("x0"), col("y0"))
    val counts = tri
      .select(explode(array(col("apex"), col("x0"), col("y0"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
      .localCheckpoint(eager = true)
    und.unpersist(); o.unpersist()
    counts
  }

  /** Multi-source BFS shortest hop counts over a directed edge list —
    * the reachability primitive under crawl-depth audits and
    * link-distance features. Frontier expansion: each round joins the
    * CURRENT frontier (only) onto the edges, anti-joins everything
    * already settled, and truncates lineage — rounds = min(graph
    * eccentricity, maxHops), each one join + one anti-join + one
    * distinct, never a transitive closure. Unreached vertices are
    * absent from the output (no sentinel row per vertex — at scale
    * the unreached set is the big one).
    *
    * Output: (id, hops) — hops = length of the shortest directed path
    * from any source (0 for the sources themselves).
    */
  def bfsHops(edges: DataFrame, sources: DataFrame, maxHops: Int = 20): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).persist(lvl)
    var visited = sources.select(col("id").cast("long").as("id"))
      .distinct().withColumn("hops", lit(0))
      .localCheckpoint(eager = true)
    var frontier = visited.select(col("id"))
    var h = 1
    var done = maxHops == 0
    while (!done) {
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint(eager = true)
      if (next.isEmpty || h == maxHops) done = true
      if (!next.isEmpty) {
        visited = visited.unionByName(next.withColumn("hops", lit(h)))
          .localCheckpoint(eager = true)
        frontier = next
        h += 1
      }
    }
    e.unpersist()
    visited
  }

  /** k-core decomposition membership: iteratively peel vertices of
    * undirected degree < k until a fixpoint — the standard
    * community/spam-farm density primitive (Seidman cores; what
    * link-quality pipelines use to find tightly-knit clusters a
    * PageRank prior misses). Directed input is canonicalized to
    * distinct undirected edges (self-loops dropped).
    *
    * Scale shape: each round is ONE degree aggregation + two
    * semi-joins re-filtering the edge list; the edge list SHRINKS
    * monotonically, so later rounds are cheaper, and lineage is
    * truncated per round (the BFS lesson — an unbounded iterative
    * plan re-executes from scratch). Rounds = peel depth of the
    * graph, not diameter; real link graphs converge in tens of
    * rounds. Never a closure, never a driver-side edge set.
    *
    * Output: (id, core_deg) — survivors with their degree INSIDE the
    * k-core (≥ k by definition). Empty when no k-core exists.
    */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var und = edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("u"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(eager = true)
    var it = 0
    var done = false
    while (!done && it < maxIters) {
      val deg = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("id")).persist(lvl)
      val next = und
        .join(keep.select(col("id").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("id").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(eager = true)
      done = next.count() == und.count()
      keep.unpersist()
      und = next
      it += 1
    }
    und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).cast("bigint").as("core_deg"))
  }
}
