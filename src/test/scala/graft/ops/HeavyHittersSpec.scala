package graft.ops

import scala.util.Random

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {

  test("misraGries never evicts an item above the n/(k+1) threshold") {
    val rnd = new Random(7)
    // skewed stream: 3 hot items amid a uniform tail
    val stream = Seq.fill(3000)(rnd.nextInt(500).toString) ++
      Seq.fill(400)("hot-a") ++ Seq.fill(300)("hot-b") ++ Seq.fill(200)("hot-c")
    val shuffled = rnd.shuffle(stream)
    val k = 20
    val sketch = HeavyHitters.misraGries(shuffled.iterator, k)
    assert(sketch.size <= k)
    val n = shuffled.size
    val trueCounts = shuffled.groupBy(identity).map { case (g, xs) => g -> xs.size }
    trueCounts.foreach { case (g, c) =>
      if (c.toLong * (k + 1) > n) assert(sketch.contains(g), s"lost heavy hitter $g ($c/$n)")
    }
  }

  test("heavyGrams equals the naive full-groupBy plan") {
    import spark.implicits._
    val rnd = new Random(11)
    val vocab = ('a' to 'j').map(_.toString)
    val docs = (0 until 60).map { i =>
      val boiler = if (i % 3 == 0) "x y z x y" else ""
      val body = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, s"$boiler $body")
    }.toDF("doc_id", "text").repartition(5)

    for (k <- Seq(10, 200)) {
      val fast = HeavyHitters.heavyGrams(docs, k = k, n = 2)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val slow = HeavyHitters.heavyGramsNaive(docs, k = k, n = 2)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(fast == slow, s"k=$k sketched != naive")
      // at k=200 the threshold drops below the planted boilerplate
      // frequency, so the repeated bigrams must surface
      assert(fast.nonEmpty || k == 10)
    }
  }

  test("heavyGrams on the sf0.001 documents table is non-degenerate") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = HeavyHitters.heavyGrams(docs, k = 800, n = 2).collect()
    assert(out.nonEmpty)
    // ordered by cnt desc then gram
    val pairs = out.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sliding(2).forall {
      case Array((c1, g1), (c2, g2)) => c1 > c2 || (c1 == c2 && g1 < g2)
      case _ => true
    })
  }
}
