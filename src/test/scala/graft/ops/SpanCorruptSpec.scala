package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class SpanCorruptSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Independent reference corruption. */
  private def ref(id: Long, text: String): (String, String, Int, Int, Int) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val masked = toks.indices.map(i => md5hex(s"$id:$i").take(2) < "26")
    val in = new StringBuilder; val tgt = new StringBuilder
    var span = -1
    toks.indices.foreach { i =>
      if (!masked(i)) { if (in.nonEmpty) in += ' '; in ++= toks(i) }
      else {
        val start = i == 0 || !masked(i - 1)
        if (start) {
          span += 1
          if (in.nonEmpty) in += ' '; in ++= s"<extra_id_$span>"
          if (tgt.nonEmpty) tgt += ' '; tgt ++= s"<extra_id_$span> ${toks(i)}"
        } else { tgt += ' '; tgt ++= toks(i) }
      }
    }
    (in.toString, tgt.toString, toks.length, masked.count(identity), span + 1)
  }

  test("corruption matches an independent reimplementation") {
    import spark.implicits._
    val fixtures = Seq(
      (7L, (1 to 60).map(i => s"tok$i").mkString(" ")),
      (8L, "single"),
      (9L, (1 to 200).map(i => s"w${i % 13}").mkString(" ")))
    val got = SpanCorrupt.corrupt(fixtures.toDF("doc_id", "text"))
      .as[(Long, String, String, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    fixtures.foreach { case (id, text) =>
      val (in, tgt, n, nm, ns) = ref(id, text)
      val g = got(id)
      assert(g._2 === in, s"masked_text doc $id")
      assert(g._3 === tgt, s"target_text doc $id")
      assert((g._4, g._5, g._6) === ((n, nm, ns)), s"counts doc $id")
    }
  }

  test("target splices back into the input to reconstruct the original") {
    import spark.implicits._
    val text = (1 to 120).map(i => s"x$i").mkString(" ")
    val Array(row) = SpanCorrupt.corrupt(Seq((42L, text)).toDF("doc_id", "text"))
      .as[(Long, String, String, Int, Int, Int)].collect()
    val (_, in, tgt, _, _, nSpans) = row
    // parse target: "<extra_id_k> t1 t2 <extra_id_k+1> t3 ..." -> spans
    val spanTokens = scala.collection.mutable.Map.empty[Int, List[String]]
    var cur = -1
    tgt.split(" ").foreach {
      case s if s.startsWith("<extra_id_") =>
        cur = s.stripPrefix("<extra_id_").stripSuffix(">").toInt
        spanTokens(cur) = Nil
      case t => spanTokens(cur) = spanTokens(cur) :+ t
    }
    assert(spanTokens.keySet === (0 until nSpans).toSet)
    val rebuilt = in.split(" ").flatMap {
      case s if s.startsWith("<extra_id_") =>
        spanTokens(s.stripPrefix("<extra_id_").stripSuffix(">").toInt)
      case t => Seq(t)
    }.mkString(" ")
    assert(rebuilt === text)
  }

  test("mask rate sits near the configured 14.8%") {
    import spark.implicits._
    val docs = (0L until 50L).map(id =>
      (id, (1 to 100).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rate = SpanCorrupt.corrupt(docs)
      .agg((org.apache.spark.sql.functions.sum(col("n_masked")) /
        org.apache.spark.sql.functions.sum(col("n_tokens"))).as("r"))
      .head().getDouble(0)
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate")
  }
}
