package graft.ops

import graft.SparkSpec

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
}
