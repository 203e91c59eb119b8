// Hosted under org.apache.spark.sql because the Expression typing API
// and the Column↔Expression bridge (classic.ExpressionUtils) are
// private[sql] — the standard packaging for third-party native
// expressions.
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over UTF-8 bytes: one linear pass finds all
  * occurrences of every pattern simultaneously. Built once per
  * expression instance on each executor (the automaton ships as a
  * codegen reference object), so a K-phrase blocklist costs O(text)
  * per row instead of K substring scans — the difference between a
  * corpus screen that scales with blocklist size and one that
  * doesn't. Byte-level matching makes multi-byte UTF-8 exact for
  * free: a pattern matches iff its byte sequence occurs.
  *
  * Dense goto rows (256 ints/node) keep the hot loop a single array
  * index per byte; fail links resolve at build time (the goto table
  * is fully materialized, BFS order), so matching never chases fail
  * chains. Output bitsets are merged along fail links at build time
  * too — each node knows every pattern that ends there.
  */
final class AhoCorasick(patterns: Array[Array[Byte]]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern list")
  require(patterns.forall(_.nonEmpty), "empty pattern")

  private val (gotoTab, outTab) = {
    val cap = patterns.map(_.length).sum + 1
    val gt = Array.fill(cap, 256)(-1)
    val out = Array.fill(cap)(new java.util.BitSet(patterns.length))
    var nodes = 1
    var p = 0
    while (p < patterns.length) {
      var s = 0
      for (b <- patterns(p)) {
        val c = b & 0xff
        if (gt(s)(c) < 0) { gt(s)(c) = nodes; nodes += 1 }
        s = gt(s)(c)
      }
      out(s).set(p)
      p += 1
    }
    // BFS: resolve fail links and fully materialize goto (missing
    // transitions point where the fail chain would land)
    val fail = new Array[Int](nodes)
    val queue = new java.util.ArrayDeque[Integer]()
    var c = 0
    while (c < 256) {
      val nxt = gt(0)(c)
      if (nxt < 0) gt(0)(c) = 0
      else { fail(nxt) = 0; queue.add(nxt) }
      c += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      out(s).or(out(fail(s)))
      c = 0
      while (c < 256) {
        val nxt = gt(s)(c)
        if (nxt < 0) gt(s)(c) = gt(fail(s))(c)
        else { fail(nxt) = gt(fail(s))(c); queue.add(nxt) }
        c += 1
      }
    }
    (gt, out)
  }

  /** Distinct ids (ascending) of patterns occurring in `text`. */
  def matchIdSet(bytes: Array[Byte], offset: Int, len: Int): java.util.BitSet = {
    val hits = new java.util.BitSet(gotoTab.length)
    var s = 0
    var i = offset
    val end = offset + len
    while (i < end) {
      s = gotoTab(s)(bytes(i) & 0xff)
      if (!outTab(s).isEmpty) hits.or(outTab(s))
      i += 1
    }
    hits
  }

  /** Spark-facing form: UTF8String in, sorted id array out. Called
    * from both the interpreted eval and the generated code.
    */
  def matchIds(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val hits = matchIdSet(bytes, 0, bytes.length)
    val ids = new Array[Any](hits.cardinality())
    var i = hits.nextSetBit(0)
    var k = 0
    while (i >= 0) { ids(k) = i; k += 1; i = hits.nextSetBit(i + 1) }
    new GenericArrayData(ids)
  }
}

/** `multi_match(text)` — array of distinct ids of blocklist patterns
  * occurring in the text, via a shared Aho–Corasick automaton. The
  * pattern list is part of the expression (a query-constant
  * blocklist); data-dependent pattern sets belong to the join-based
  * screens ([[graft.ops.TextDedup]] `t54`/`d54`), not a per-row scan.
  */
case class MultiPatternMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_match needs a non-empty list of non-empty patterns")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "multi_match"

  @transient private lazy val automaton =
    new AhoCorasick(patterns.map(_.getBytes("UTF-8")).toArray)

  override def nullSafeEval(input: Any): Any =
    automaton.matchIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ac = ctx.addReferenceObj("ahoCorasick", automaton,
        classOf[AhoCorasick].getName)
      s"${ev.value} = (${classOf[ArrayData].getName}) $ac.matchIds($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiPatternMatch {
  /** Column-API form. */
  def multiMatch(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      MultiPatternMatch(ExpressionUtils.expression(text), patterns))

  /** Register as SQL `multi_match(text)` with a fixed pattern list. */
  def register(spark: SparkSession, patterns: Seq[String]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_match",
      exprs => MultiPatternMatch(exprs.head, patterns),
      "built-in")
}
