// Hosted under org.apache.spark.sql because the Expression typing API
// (AbstractDataType) and the Column↔Expression bridge
// (classic.ExpressionUtils) are private[sql] — the standard packaging
// for third-party native expressions.
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro–Winkler similarity over two
  * string columns — the record-linkage scorer (typo'd names, dirty
  * entity tables) Spark lacks next to its built-in `levenshtein`.
  * Same extension tier as [[CosineSimilarity]]: whole-stage codegen
  * stays unbroken (`defineCodeGen` emits a static call, no boxing,
  * no UDF dispatch).
  *
  * Semantics are the classic definition with the rapidfuzz/DuckDB
  * boost convention (the d64 oracle pins parity): match window
  * ⌊max/2⌋−1, half-transpositions, Winkler prefix bonus (ℓ ≤ 4,
  * p = 0.1) applied only when jaro > 0.7.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftext.JaroWinkler.compute($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The scalar kernel (also the codegen target — a static call from
    * the generated Java).
    */
  def compute(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val n1 = s1.length; val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(0, math.max(n1, n2) / 2 - 1)
    val matched1 = new Array[Boolean](n1)
    val matched2 = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s2.charAt(j) == s1.charAt(i)) {
          matched1(i) = true; matched2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars compared in order
    var k = 0
    var halfT = 0
    i = 0
    while (i < n1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val t = halfT / 2.0
    val jaro = (m.toDouble / n1 + m.toDouble / n2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxL = math.min(4, math.min(n1, n2))
      while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** Column-API form. */
  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
