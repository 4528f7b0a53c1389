package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native codegen'd |A ∩ B| over two arrays that are BOTH sorted
  * ascending (`sort_array` output), element type `string` or `long`
  * (both sides alike): a two-pointer merge — no per-row hash set, no
  * allocation — in O(|A|+|B|) comparison steps. The verification kernel
  * of the prefix-filtered set-similarity join
  * ([[graft.ops.Dedup.ngramJaccardPairs]]): each surviving candidate
  * pair needs one exact intersection count, and `array_intersect` would
  * build a hash set per row. The long form exists because the set-sim
  * join verifies over xxhash64 shingle fingerprints — 8-byte compares
  * and ~4× smaller candidate payloads than UTF8 shingles. Inputs are
  * treated as SETS (elements distinct by construction upstream —
  * `dropDuplicates` on (id, s)); duplicate elements would count
  * min-multiplicity matches like a merge join. Null arrays propagate
  * null; null ELEMENTS sort first in `sort_array` and compare equal to
  * each other, so both sides skip them in lockstep (upstream never
  * produces them; the long form assumes non-null elements, as
  * `containsNull = false` collect_list output guarantees).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires two array<string> or two array<long> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemIsLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    if (elemIsLong) {
      while (i < nx && j < ny) {
        val xi = x.getLong(i)
        val yj = y.getLong(j)
        if (xi == yj) { c += 1; i += 1; j += 1 }
        else if (xi < yj) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val xi = x.getUTF8String(i)
        val yj = y.getUTF8String(j)
        val cmp = if (xi == null && yj == null) 0
                  else if (xi == null) -1
                  else if (yj == null) 1
                  else xi.compareTo(yj)
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val cmp = ctx.freshName("cmp")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      val body =
        if (elemIsLong)
          s"""
             |while ($i < $nx && $j < $ny) {
             |  long $xi = $a.getLong($i);
             |  long $yj = $b.getLong($j);
             |  if ($xi == $yj) { $c++; $i++; $j++; }
             |  else if ($xi < $yj) { $i++; } else { $j++; }
             |}
           """.stripMargin
        else
          s"""
             |while ($i < $nx && $j < $ny) {
             |  $u $xi = $a.getUTF8String($i);
             |  $u $yj = $b.getUTF8String($j);
             |  int $cmp = ($xi == null && $yj == null) ? 0
             |    : ($xi == null) ? -1 : ($yj == null) ? 1 : $xi.compareTo($yj);
             |  if ($cmp == 0) { $c++; $i++; $j++; }
             |  else if ($cmp < 0) { $i++; } else { $j++; }
             |}
           """.stripMargin
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |$body
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCount {
  /** Column-API entry point: both inputs must be `sort_array` outputs. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      SortedIntersectCount(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
