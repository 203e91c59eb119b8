package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** FIM transform invariants: the three segments always reassemble to
  * the original document, sentinel order follows the mode, the rate
  * gate holds, and output is partitioning-invariant.
  */
class FimSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("segments reassemble to the original document for both modes") {
    val orig = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+")
        .filter(_.nonEmpty).mkString(" ")).toMap
    val out = Fim.transform(docs).collect()
    assert(out.nonEmpty)
    var psm = 0
    var spm = 0
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = r.getAs[String]("fim_text")
      r.getAs[String]("mode") match {
        case "psm" =>
          psm += 1
          // <PRE> p <SUF> s <MID> m  →  p + m + s = original
          val m1 = t.stripPrefix("<PRE> ")
          val Array(p, rest) = m1.split(" <SUF> ", 2)
          val Array(sfx, mid) = rest.split(" <MID> ", 2)
          assert(Seq(p, mid, sfx).filter(_.nonEmpty).mkString(" ") == orig(id), s"doc $id")
        case "spm" =>
          spm += 1
          val m1 = t.stripPrefix("<SUF> ")
          val Array(sfx, rest) = m1.split(" <PRE> ", 2)
          val Array(p, mid) = rest.split(" <MID> ", 2)
          assert(Seq(p, mid, sfx).filter(_.nonEmpty).mkString(" ") == orig(id), s"doc $id")
        case "none" =>
          assert(r.getAs[Int]("split_a") == -1 && r.getAs[Int]("split_b") == -1)
      }
    }
    // the rate gate transforms roughly half; both modes appear
    assert(psm > 0 && spm > 0)
    val rate = (psm + spm).toDouble / out.length
    assert(rate > 0.3 && rate < 0.7, s"FIM rate $rate far from 0.5")
  }

  test("deterministic across partitioning") {
    val a = Fim.transform(docs).collect()
      .map(r => (r.getLong(0), r.getString(5))).toMap
    val b = Fim.transform(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(5))).toMap
    assert(a == b)
  }

  test("split points always cut a nonempty prefix inside the word range") {
    Fim.transform(docs).filter(col("mode") =!= "none").collect().foreach { r =>
      val a = r.getAs[Int]("split_a")
      val b = r.getAs[Int]("split_b")
      val n = r.getAs[Int]("n_words")
      assert(a >= 1 && a <= n - 1 && b >= a && b <= n, s"a=$a b=$b n=$n")
    }
  }
}
