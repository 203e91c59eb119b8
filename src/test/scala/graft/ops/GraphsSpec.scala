package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer PageRank semantics on hand-computable graphs. */
class GraphsSpec extends SparkSpec {

  import spark.implicits._

  test("one iteration on a 3-cycle plus isolated node, by hand") {
    // 1→2→3→1, node 4 isolated. outdeg 1 everywhere on the cycle:
    // after one round every cycle node holds 150000 + 850·10⁶/1000
    // = 1000000; node 4 keeps only the teleport mass 150000.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L).toDF("id")
    val r = Graphs.pageRank(edges, verts, iters = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 1000000L && r(2L) == 1000000L && r(3L) == 1000000L)
    assert(r(4L) == 150000L)
  }

  test("two iterations on a star: hub accumulates, leaves equalize") {
    // leaves 1..4 each point at hub 5; hub points at leaf 1.
    val edges = ((1L to 4L).map(_ -> 5L) :+ (5L -> 1L)).toDF("src", "dst")
    val verts = (1L to 5L).toDF("id")
    val r1 = Graphs.pageRank(edges, verts, iters = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // hand: hub gets 4 × (10⁶ div 1) contributions → 150000 + 850·4·10⁶/1000
    assert(r1(5L) == 150000L + 850L * 4000000L / 1000L)
    assert(r1(1L) == 150000L + 850L * 1000000L / 1000L) // from the hub
    assert(r1(2L) == 150000L && r1(3L) == 150000L && r1(4L) == 150000L)
    val r2 = Graphs.pageRank(edges, verts, iters = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // iteration 2 replays the update on r1 exactly
    assert(r2(5L) == 150000L +
      850L * (r1(1L) + r1(2L) + r1(3L) + r1(4L)) / 1000L)
    assert(r2(1L) == 150000L + 850L * r1(5L) / 1000L)
  }

  test("HITS: star hub/authority split, max normalization by hand") {
    // leaves 1..4 → hub 5; hub 5 → authority 6.
    // round 1 hubs: raw(leaf) = a(5) = 10⁶; raw(5) = a(6) = 10⁶ — all
    // equal → every linking node normalizes to 10⁶, nodes 6 has no
    // out-edge → hub 0. round 1 auth: raw(5) = 4·10⁶ (from 4 leaves),
    // raw(6) = 10⁶ → a(5) = 10⁶, a(6) = 250000, leaves 0.
    val edges = ((1L to 4L).map(_ -> 5L) :+ (5L -> 6L)).toDF("src", "dst")
    val verts = (1L to 6L).toDF("id")
    val r = Graphs.hits(edges, verts, iters = 1).collect()
      .map(x => x.getAs[Long]("id") ->
        ((x.getAs[Long]("hub_micro"), x.getAs[Long]("auth_micro")))).toMap
    assert(r(1L) == ((1000000L, 0L)) && r(4L) == ((1000000L, 0L)))
    assert(r(5L) == ((1000000L, 1000000L)))
    assert(r(6L) == ((0L, 250000L)))
  }

  test("self-loops and parallel edges are dropped; determinism across partitioning") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 2L), (2L, 1L)).toDF("src", "dst")
    val verts = Seq(1L, 2L).toDF("id")
    val a = Graphs.pageRank(edges, verts, iters = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val b = Graphs.pageRank(edges.repartition(7), verts.repartition(3), iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(a == b)
    // with self-loop/dup removal this is a 2-cycle: symmetric ranks
    val m = a.toMap
    assert(m(1L) == m(2L))
  }

  test("triangles: K4 has 4 triangles, 3 per vertex; an appended tail has none") {
    // complete graph on {1..4} + pendant edge 4–5
    val edges = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .toSeq.appended((4L, 5L)).toDF("src", "dst")
    val r = Graphs.triangleCounts(edges).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: orientation-direction, duplicate and self-loop robustness") {
    // one triangle given with mixed directions, duplicates, a self-loop
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (3L, 2L))
      .toDF("src", "dst")
    val r = Graphs.triangleCounts(edges).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: skewed hub-star plus one closing edge — exactly the closed wedges count") {
    // star center 0 with 30 leaves; only leaves 1–2 are connected to
    // each other → exactly one triangle despite the hub's 30 wedge pairs
    val edges = ((1L to 30L).map(l => (0L, l)) :+ (1L, 2L)).toDF("src", "dst")
    val r = Graphs.triangleCounts(edges.repartition(5)).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("bfsHops: chain, diamond shortcut, maxHops cut, unreached absent") {
    // 1→2→3→4→5 plus shortcut 1→4; 9 isolated; 6→7 not reachable
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (6L, 7L))
      .toDF("src", "dst")
    def run(maxHops: Int) =
      Graphs.bfsHops(edges, Seq(1L).toDF("id"), maxHops).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // shortest paths: 4 via the shortcut (1 hop), 5 via it (2 hops)
    assert(run(10) == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2))
    assert(run(1) == Map(1L -> 0, 2L -> 1, 4L -> 1))
    assert(run(0) == Map(1L -> 0))
    // multi-source: nearer source wins
    val multi = Graphs.bfsHops(edges, Seq(1L, 3L).toDF("id"), 10).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(multi == Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1, 5L -> 2))
  }

  test("kCore: cascade peel on a clique with a pendant chain; K4 fixpoints") {
    import spark.implicits._
    def core(es: Seq[(Long, Long)], k: Int): Map[Long, Long] =
      Graphs.kCore(es.toDF("src", "dst"), k).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 (deg 3): the whole graph IS the 3-core; 4-core is empty
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(core(k4, 3) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(core(k4, 4).isEmpty)
    // house of cards: K4 + chain 4-5-6, each chain node with 2 clique
    // edges; at k=3 node 6 (deg 2+1=3... tail 6 has edges to 0,1 and 5)
    // chain node degs: 4:(0,1,5)=3, 5:(0,1,4,6)=4, 6:(0,1,5)=3 — all
    // survive k=3 as a unit; at k=4 the chain peels over 2+ rounds,
    // dragging each other down, and K4 remains iff deg inside stays 3…
    // K4 nodes lose chain edges → deg 3 < 4 → EVERYTHING peels.
    val chain = k4 ++ Seq((4L, 0L), (4L, 1L), (5L, 0L), (5L, 1L),
      (4L, 5L), (5L, 6L), (6L, 0L), (6L, 1L))
    assert(core(chain, 3).keySet == (0L to 6L).toSet) // one 3-core block
    assert(core(chain, 4) == Map.empty[Long, Long])   // full cascade collapse
    // directed duplicates + self loops canonicalize away
    val messy = Seq((0L, 1L), (1L, 0L), (0L, 0L), (1L, 2L), (2L, 0L))
    assert(core(messy, 2) == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }
}
