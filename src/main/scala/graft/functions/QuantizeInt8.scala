package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen'd per-vector int8 (0..255) scalar quantization of an
  * embedding column — the 4x storage/scan cut an embedding store takes
  * before ANN serving: `code_i = round((x_i - min) / ((max - min) / 255))`
  * with round-half-up, so `min + code_i * scale` reconstructs to within
  * half a step. The (min, max) pair each vector needs for dequantization
  * is NOT re-emitted here — `array_min`/`array_max` are already codegen'd
  * builtins and this expression's internal min/max (computed over
  * double-widened elements) agrees with them exactly, double widening
  * being monotone. A constant vector (max == min) codes to all zeros
  * rather than NaNs, so degenerate embeddings stay filterable.
  *
  * All arithmetic is double, regardless of a float input column — the
  * widen-then-compute contract shared with [[L2Normalize]] (and mirrored
  * by CAST-to-DOUBLE in the DuckDB oracle, whose float arithmetic would
  * otherwise stay in float32).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"quantize_int8 requires array<float|double>, got ${other.catalogString}")
  }

  // A null ELEMENT nulls the whole result (getFloat/getDouble would
  // silently read a null slot as 0.0 and skew min/max and every code) —
  // so the expression is nullable whenever the element type is, even over
  // a non-null column. Parquet-read embeddings carry containsNull=true.
  private def containsNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = child.nullable || (child.resolved && containsNull)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val v = new Array[Double](n)
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      if (containsNull && x.isNullAt(i)) return null
      v(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      if (v(i) < mn) mn = v(i)
      if (v(i) > mx) mx = v(i)
      i += 1
    }
    val out = new Array[Int](n)
    if (mx > mn) {
      val sc = (mx - mn) / 255.0
      i = 0
      while (i < n) { out(i) = math.floor((v(i) - mn) / sc + 0.5).toInt; i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx")
      val sc = ctx.freshName("sc")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val xi = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val core =
        s"""
           |double[] $v = new double[$n];
           |double $mn = Double.POSITIVE_INFINITY;
           |double $mx = Double.NEGATIVE_INFINITY;
           |for (int $i = 0; $i < $n; $i++) {
           |  $v[$i] = $xi;
           |  if ($v[$i] < $mn) $mn = $v[$i];
           |  if ($v[$i] > $mx) $mx = $v[$i];
           |}
           |int[] $out = new int[$n];
           |if ($mx > $mn) {
           |  double $sc = ($mx - $mn) / 255.0;
           |  for (int $i = 0; $i < $n; $i++)
           |    $out[$i] = (int) java.lang.Math.floor(($v[$i] - $mn) / $sc + 0.5);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      // mirror nullSafeEval's null-element propagation; ev.isNull is only
      // assignable when `nullable` — which containsNull guarantees here
      val guarded =
        if (containsNull)
          s"""
             |boolean $hasNull = false;
             |for (int $i = 0; $i < $n; $i++)
             |  if ($a.isNullAt($i)) { $hasNull = true; break; }
             |if ($hasNull) {
             |  ${ev.isNull} = true;
             |} else {
             |$core
             |}
           """.stripMargin
        else core
      s"""
         |int $n = $a.numElements();
         |$guarded
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object QuantizeInt8 {
  /** Column-API entry point: `QuantizeInt8($"vec")`. */
  def apply(v: Column): Column =
    GraftSqlBridge.column(QuantizeInt8(GraftSqlBridge.expression(v)))
}
