package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-position Hamming distance between two strings (count of
  * positions whose code points differ; a length surplus on either side
  * counts one difference per extra code point) — the verify kernel of
  * [[graft.ops.Dedup.hammingLinkage]].
  *
  * Replaces `aggregate(zip_with(split(a, ''), split(b, ''), ...))`:
  * lambda higher-order functions are CodegenFallback (interpreted — see
  * [[graft.ops.Texts]]), so the old form allocated two per-character
  * arrays and walked them with interpreted closures PER CANDIDATE PAIR —
  * the dominant cost of the record-linkage entry once the blocking
  * itself was equi-join-shaped. This is one generated-code call into a
  * code-point loop: no arrays, no regex, no interpretation. Code-POINT
  * iteration (not UTF-16 code units) matches `split(s, '')`, which
  * splits on Java-regex boundaries and never separates surrogate pairs.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hamming_distance requires (string, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HammingDistance.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HammingDistance$$.MODULE$$.dist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {

  def dist(a: UTF8String, b: UTF8String): Int = {
    val na = a.numBytes
    val nb = b.numBytes
    // ASCII fast path (the overwhelmingly common case for linkage keys):
    // all bytes < 0x80 means byte == code point
    var ascii = true
    var i = 0
    while (ascii && i < na) { if (a.getByte(i) < 0) ascii = false; i += 1 }
    i = 0
    while (ascii && i < nb) { if (b.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      val n = math.min(na, nb)
      var d = math.max(na, nb) - n
      i = 0
      while (i < n) {
        if (a.getByte(i) != b.getByte(i)) d += 1
        i += 1
      }
      d
    } else {
      val s = a.toString
      val t = b.toString
      var d = 0
      var si = 0
      var ti = 0
      while (si < s.length && ti < t.length) {
        val ca = s.codePointAt(si)
        val cb = t.codePointAt(ti)
        if (ca != cb) d += 1
        si += Character.charCount(ca)
        ti += Character.charCount(cb)
      }
      while (si < s.length) { d += 1; si += Character.charCount(s.codePointAt(si)) }
      while (ti < t.length) { d += 1; ti += Character.charCount(t.codePointAt(ti)) }
      d
    }
  }

  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      HammingDistance(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
