package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Bigram-LM perplexity (LangModel.scala): the add-one math is pinned
  * on a corpus small enough to score by hand, including the
  * unseen-bigram LEFT-join path and the train/score split.
  */
class LangModelSpec extends SparkSpec {

  test("add-one bigram scoring matches hand computation") {
    import spark.implicits._
    // train = doc 0 only: bigrams (a,b)x2, (b,a)x2; c1(a)=c1(b)=2; V=2
    val docs = Seq((0L, "a b a b a"), (1L, "a b c")).toDF("doc_id", "text")
    val rows = LangModel.perplexity(docs, trainMaxId = 1)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Long, Double, Double)].collect()

    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 0: every bigram p = (2+1)/(2+2) = 0.75
    val avg0 = math.log(0.75)
    assert(rows(0) == ((0L, 4, 0, 8L, r6(avg0), r6(math.exp(-avg0)))))
    // doc 1: (a,b) p=0.75; (b,c) unseen p=(0+1)/(2+2)=0.25
    val avg1 = (math.log(0.75) + math.log(0.25)) / 2
    assert(rows(1) == ((1L, 2, 1, 2L, r6(avg1), r6(math.exp(-avg1)))))
  }

  test("docs with fewer than two words drop out; unseen lefts smooth to 1/V") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, "x"), (2L, "c d")).toDF("doc_id", "text")
    val rows = LangModel.perplexity(docs, trainMaxId = 1)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq(0L, 2L)) // doc 1 has no bigram
    // doc 2: (c,d) has c2=0 AND c1(c)=0 -> p = 1/(0+V) = 1/2
    assert(rows(1)._3 == 1 && rows(1)._5 == BigDecimal(math.log(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("Kneser-Ney matches hand computation, backoff and floor included") {
    import spark.implicits._
    // train = doc 0: bigrams (a,b)x2, (b,a)x2 -> c2 symmetric;
    // c1(a)=c1(b)=2, N1+(a.)=N1+(b.)=1, N1+(.a)=N1+(.b)=1, T=2, V=2
    val docs = Seq((0L, "a b a b a"), (1L, "a b x"), (2L, "z q")).toDF("doc_id", "text")
    val rows = LangModel.knPerplexity(docs, trainMaxId = 1)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, Double, Double)].collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // doc 0: both bigram types seen; p(b|a) = (2-.75)/2 + .75*1/2 * (1/2)
    val pSeen = ((2.0 - 0.75) + 0.75 * 1 * 0.5) / 2.0
    assert(rows(0)._1 == 0L && rows(0)._2 == 4 && rows(0)._3 == 0 && rows(0)._4 == 0)
    assert(rows(0)._5 == r6(math.log(pSeen)))

    // doc 1: (a,b) seen; (b,x): c1(b)=2 but x never a right -> floor
    // pcb = 1/(V+1) = 1/3: p = 0 + .75*1*(1/3) / 2
    val pFloor = (0.0 + 0.75 * 1 * (1.0 / 3)) / 2.0
    assert(rows(1)._3 == 1 && rows(1)._4 == 0)
    assert(rows(1)._5 == r6((math.log(pSeen) + math.log(pFloor)) / 2))

    // doc 2: (z,q) unseen left context -> backoff to floor pcb = 1/3
    assert(rows(2)._3 == 1 && rows(2)._4 == 1)
    assert(rows(2)._5 == r6(math.log(1.0 / 3)))
  }

  test("KN probabilities sum to 1 over the seen-right vocabulary") {
    // mathematical invariant of interpolated KN: for any trained left
    // context a, sum over b in {words seen as a bigram right} of
    // p(b|a) = (c1 - D*N1a)/c1 + (D*N1a/c1) * sum(pc) = 1 exactly
    import spark.implicits._
    val docs = Seq((0L, "the cat sat on the mat the cat ran"),
      (1L, "a dog sat on a mat")).toDF("doc_id", "text")
    // score synthetic one-bigram docs (a, b) for every trained a and
    // every seen-right b, and add their probabilities back up
    val pairs = docs.as[(Long, String)].collect().map(_._2.split(" "))
      .flatMap(ws => ws.dropRight(1).zip(ws.drop(1)))
    val lefts = pairs.map(_._1).toSet
    val rights = pairs.map(_._2).toSet
    val probes = (for {
      (a, i) <- lefts.toSeq.sorted.zipWithIndex
      (b, j) <- rights.toSeq.sorted.zipWithIndex
    } yield (1000L + i * 100 + j, s"$a $b", a)).toSeq
    val probeDf = probes.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val scored = LangModel.knPerplexity(docs.union(probeDf.select(col("doc_id"),
        col("text"))), trainMaxId = 2)
      .filter(col("doc_id") >= 1000)
      .select(col("doc_id"), col("avg_logp")).as[(Long, Double)].collect().toMap
    val byLeft = probes.groupBy(_._3).map { case (a, ps) =>
      a -> ps.map(p => math.exp(scored(p._1))).sum
    }
    byLeft.foreach { case (a, total) =>
      assert(math.abs(total - 1.0) < 1e-5, s"context '$a' sums to $total")
    }
  }

  test("goodTuring: count-of-counts and adjusted counts by hand") {
    import spark.implicits._
    // word frequencies: a×3, b×2, c×2, d×1, e×1, f×1
    // → N_1=3, N_2=2, N_3=1; r*(1)=2·2·1000/3=1333, r*(2)=3·1·1000/2=1500,
    //   r*(3)=0 (no N_4)
    val docs = Seq((0L, "a b c d"), (1L, "a b c e"), (2L, "a f"))
      .toDF("doc_id", "text")
    val rows = LangModel.goodTuring(docs).collect()
      .map(r => r.getAs[Long]("r") ->
        ((r.getAs[Long]("n_r"), r.getAs[Long]("n_r_plus_1"),
          r.getAs[Long]("r_star_milli")))).toMap
    assert(rows == Map(
      1L -> ((3L, 2L, 1333L)),
      2L -> ((2L, 1L, 1500L)),
      3L -> ((1L, 0L, 0L))))
    // total mass identity: Σ r·N_r = corpus token count
    assert(rows.map { case (r, (nr, _, _)) => r * nr }.sum == 10L)
  }
}
