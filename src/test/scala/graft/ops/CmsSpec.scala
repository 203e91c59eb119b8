package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min invariants: never undercounts, exact at no-collision
  * width, and the sketch is a mergeable (additive) summary.
  */
class CmsSpec extends SparkSpec {

  import spark.implicits._

  private val words =
    Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++ Seq.fill(9)("gamma") ++
      (0 until 60).map(i => s"tail$i")

  test("estimates never undercount; exact when width kills collisions") {
    val toks = words.toDF("token")
    val exact = toks.groupBy("token").count()
    // tight width: collisions expected, but est >= exact must hold
    val tight = Cms.estimate(Cms.sketch(toks, "token", 3, 8), exact, 3, 8)
      .join(exact, "token").collect()
    tight.foreach(r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("count"), r.toString))
    // huge width: no collisions plausible at 63 distinct tokens — the
    // md5 family is fixed, so this is a deterministic property of the
    // fixture, not a probabilistic claim
    val wide = Cms.estimate(Cms.sketch(toks, "token", 4, 1 << 16), exact, 4, 1 << 16)
      .join(exact, "token").collect()
    wide.foreach(r =>
      assert(r.getAs[Long]("est_n") == r.getAs[Long]("count"), r.toString))
  }

  test("sketch is additive: sketch(a ++ b) = sketch(a) + sketch(b)") {
    val (a, b) = words.splitAt(70)
    def sk(ws: Seq[String]) = Cms.sketch(ws.toDF("token"), "token", 3, 32)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val merged = (sk(a).keySet ++ sk(b).keySet).map { k =>
      k -> (sk(a).getOrElse(k, 0L) + sk(b).getOrElse(k, 0L))
    }.toMap
    assert(sk(words) == merged)
  }

  test("sketch size is capped at depth x width; absent key estimates from bucket noise only") {
    val toks = words.toDF("token")
    assert(Cms.sketch(toks, "token", 3, 8).count() <= 3 * 8)
    val ghost = Cms.estimate(Cms.sketch(toks, "token", 4, 1 << 16),
      Seq("never-seen").toDF("token"), 4, 1 << 16).collect().head
    assert(ghost.getAs[Long]("est_n") == 0L)
  }

  test("invalid parameters refuse") {
    val toks = words.toDF("token")
    intercept[IllegalArgumentException](Cms.sketch(toks, "token", 0, 8))
    intercept[IllegalArgumentException](Cms.sketch(toks, "token", 3, 1))
  }
}
