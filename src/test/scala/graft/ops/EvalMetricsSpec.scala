package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** pass@k invariants: hand combinatorics, the certain-pass and
  * never-pass edges, k > n dropped, and the bias tripwire (the
  * naive 1−(1−c/n)^k answer differs).
  */
class EvalMetricsSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Boolean)], ks: Seq[Int]): Map[(Long, Int), Long] = {
    import spark.implicits._
    EvalMetrics.passAtK(rows.toDF("task_id", "passed"), ks)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(4)).toMap
  }

  test("hand values: n=4, c=2 → pass@2 = 1 − C(2,2)/C(4,2) = 5/6") {
    val rows = Seq((1L, true), (1L, true), (1L, false), (1L, false))
    val got = run(rows, Seq(1, 2, 3, 4, 5))
    assert(got((1L, 1)) == 500000L)          // 1 − C(2,1)/C(4,1) = 1/2
    assert(got((1L, 2)) == 833333L)          // 5/6 floored
    assert(got((1L, 3)) == 1000000L)         // n−c=2 < 3 ⇒ certain
    assert(got((1L, 4)) == 1000000L)
    assert(!got.contains((1L, 5)))           // k > n dropped
    // bias tripwire: naive 1−(1−c/n)^k at k=2 would be 750000
    assert(got((1L, 2)) != 750000L)
  }

  test("edges: all-fail → 0 at every k; all-pass → 1e6; exact big-n") {
    val fail = Seq.fill(6)((7L, false))
    val ok = Seq.fill(6)((8L, true))
    val got = run(fail ++ ok, Seq(1, 3, 6))
    assert(Seq(1, 3, 6).forall(k => got((7L, k)) == 0L))
    assert(Seq(1, 3, 6).forall(k => got((8L, k)) == 1000000L))
    // n=200, c=1, k=100: exact rational 1 − Π(199−i)/Π(200−i) = 1 − 100/200
    val big = (0 until 200).map(i => (9L, i == 0))
    assert(run(big, Seq(100))((9L, 100)) == 500000L)
  }

  test("bleuStats: identity pair saturates, clipping caps repeats, empty refuses nothing") {
    import spark.implicits._
    def stats(cand: String, ref: String): Map[Int, (Long, Long, Long, Long)] =
      EvalMetrics.bleuStats(Seq((1L, cand, ref)).toDF("pair_id", "candidate", "reference"))
        .collect().map(r => r.getInt(1) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // identical 5-word sentences: matches == totals at every n
    val same = stats("a b c d e", "a b c d e")
    assert((1 to 4).forall(n => same(n) == (6L - n, 6L - n, 5L, 5L)))
    // the classic clipping case: "the the the" vs one "the" → 1, not 3
    val clip = stats("the the the", "the cat")
    assert(clip(1) == (1L, 3L, 3L, 2L))
    assert(clip(2) == (0L, 2L, 3L, 2L)) // "the the" never occurs in ref
    // disjoint: zero matches, totals still counted
    assert(stats("x y z", "p q")(1) == (0L, 3L, 3L, 2L))
    // empty candidate: all-zero row, no crash
    assert(stats("", "p q")(1) == (0L, 0L, 0L, 2L))
  }

  test("chrfStats: whitespace stripped, both totals, clipping, identity") {
    import spark.implicits._
    def stats(cand: String, ref: String): Map[Int, (Long, Long, Long)] =
      EvalMetrics.chrfStats(Seq((1L, cand, ref)).toDF("pair_id", "candidate", "reference"),
          maxN = 2)
        .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // "a b" vs "ab": identical after whitespace removal → full match
    val ws = stats("a b", "ab")
    assert(ws(1) == (2L, 2L, 2L) && ws(2) == (1L, 1L, 1L))
    // clipping on chars: "aaa" vs "ab" → unigram matches 1, not 3
    val clip = stats("aaa", "ab")
    assert(clip(1) == (1L, 3L, 2L))
    assert(clip(2) == (0L, 2L, 1L)) // "aa" not in ref
    // asymmetric totals: recall side sees the longer reference
    assert(stats("ab", "abcd")(1) == (2L, 2L, 4L))
  }

  test("tokenF1: SQuAD conventions — identity, clipping, empty edges") {
    import spark.implicits._
    def f1(cand: String, ref: String): (Long, Long, Long, Long, Boolean) = {
      val r = EvalMetrics.tokenF1(
        Seq((1L, cand, ref)).toDF("pair_id", "candidate", "reference")).head()
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
    }
    assert(f1("a b c", "a b c") == (3L, 3L, 3L, 1000000L, true))
    // half overlap: 2·2/(3+3) = 2/3 → 666666 floored, EM false
    assert(f1("a b x", "a b y") == (2L, 3L, 3L, 666666L, false))
    // clipping: "a a a" vs "a" overlaps once → 2·1/(3+1) = 1/2
    assert(f1("a a a", "a") == (1L, 3L, 1L, 500000L, false))
    // empty conventions: both empty = 1, one empty = 0
    assert(f1("", "") == (0L, 0L, 0L, 1000000L, true))
    assert(f1("", "a")._4 == 0L)
    // word order does not change F1, but kills EM
    assert(f1("b a", "a b") == (2L, 2L, 2L, 1000000L, false))
  }

  test("rougeL: LCS hand values — identity, disjoint, order sensitivity, crossing") {
    import spark.implicits._
    def rl(cand: String, ref: String): (Long, Long, Long, Long) = {
      val r = EvalMetrics.rougeL(
        Seq((1L, cand, ref)).toDF("pair_id", "candidate", "reference")).head()
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }
    assert(rl("a b c", "a b c") == (3L, 3L, 3L, 1000000L))
    assert(rl("a b c", "x y z") == (0L, 3L, 3L, 0L))
    // order sensitivity: bag overlap is total, LCS is not
    assert(rl("a b", "b a") == (1L, 2L, 2L, 500000L))
    // crossing alignment (rotation): LCS picks the longer block
    assert(rl("a b c d e", "d e a b c") == (3L, 5L, 5L, 600000L))
    // repeats: LCS of "a b a b" vs "b a b a" is 3 ("a b a" / "b a b")
    assert(rl("a b a b", "b a b a")._1 == 3L)
    // classic textbook: LCS("A G C A T", "G A C") = 2
    assert(rl("A G C A T", "G A C")._1 == 2L)
    // subsequence (deletion-only): full short side
    assert(rl("a b c d", "b d") == (2L, 4L, 2L, 666666L))
    // empty conventions match tokenF1: both = 1e6, one = 0
    assert(rl("", "") == (0L, 0L, 0L, 1000000L))
    assert(rl("a", "") == (0L, 1L, 0L, 0L))
    // brute-force cross-check on all 4-token strings over {a, b}
    def bruteLcs(x: Seq[String], y: Seq[String]): Int =
      if (x.isEmpty || y.isEmpty) 0
      else if (x.head == y.head) 1 + bruteLcs(x.tail, y.tail)
      else math.max(bruteLcs(x.tail, y), bruteLcs(x, y.tail))
    val toks = Seq("a", "b")
    val all = for (p <- toks; q <- toks; r <- toks; s <- toks) yield Seq(p, q, r, s)
    val pairs = for ((x, i) <- all.zipWithIndex; (y, j) <- all.zipWithIndex)
      yield ((i * all.size + j).toLong, x.mkString(" "), y.mkString(" "))
    val got = EvalMetrics.rougeL(pairs.toDF("pair_id", "candidate", "reference"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((x, i) <- all.zipWithIndex; (y, j) <- all.zipWithIndex)
      assert(got((i * all.size + j).toLong) == bruteLcs(x, y).toLong,
        s"LCS mismatch on $x vs $y")
  }

  test("cohensKappa: hand values incl. a NEGATIVE kappa floor, perfect and chance") {
    import spark.implicits._
    def kappa(rows: Seq[(String, String)]): (Long, Long, Long, Long) = {
      val r = EvalMetrics.cohensKappa(rows.toDF("a", "b")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // perfect agreement over two classes: κ = 1
    assert(kappa(Seq(("x", "x"), ("y", "y"), ("x", "x"), ("y", "y")))
      == (4L, 4L, 8L, 1000000L))
    // systematic DISagreement: agree=0, pe_num=8, κ = (0−8)/(16−8) = −1
    assert(kappa(Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x")))
      == (4L, 0L, 8L, -1000000L))
    // textbook 2×2: n=4, agree=2, pe_num = 2·2+2·2 = 8 ⇒ κ = 0 at chance
    assert(kappa(Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")))._4 == 0L)
    // floor on a negative non-integer: n=3, agree=0, both raters
    // uniform over 3 classes ⇒ pe_num=3, κ = −3/6 = −0.5 exactly;
    // shift one count: a=(x,x,y), b=(y,y,x): agree 0, pe_num = 2·1+1·2 = 4,
    // κ = (0−4)/(9−4) = −0.8 → floor −800000
    assert(kappa(Seq(("x", "y"), ("x", "y"), ("y", "x")))._4 == -800000L)
  }

  test("mannWhitneyU: textbook ranks, mid-rank ties, U_a + U_b invariant") {
    import spark.implicits._
    def u(rows: Seq[(Boolean, Long)]): (Long, Long, Long, Long, Long) = {
      val r = EvalMetrics.mannWhitneyU(rows.toDF("is_a", "v"), "is_a", "v").head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }
    // no ties: A = {1, 3}, B = {2, 4}; ranks 1,3 → R_a = 4, U_a = 4−3 = 1
    assert(u(Seq((true, 1L), (false, 2L), (true, 3L), (false, 4L)))
      == (2L, 2L, 4000L, 1000L, 3000L))
    // all A below all B: U_a = 0 (stochastic dominance edge)
    assert(u(Seq((true, 1L), (true, 2L), (false, 5L), (false, 6L)))._4 == 0L)
    // ties: A = {5}, B = {5}; both get mid-rank 1.5 → R_a = 1500,
    // U_a = 1500 − 1000·1·2/2 = 500 = half of n_a·n_b·1000
    assert(u(Seq((true, 5L), (false, 5L))) == (1L, 1L, 1500L, 500L, 500L))
    // invariant on a messy mix
    val rnd = new scala.util.Random(3)
    val mix = Seq.fill(40)((rnd.nextBoolean(), rnd.nextInt(6).toLong))
    val (na, nb, _, ua, ub) = u(mix)
    assert(ua + ub == na * nb * 1000L)
  }
}
