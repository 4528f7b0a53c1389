package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd L2 (unit-norm) normalization of a numeric array
  * column — the standard pre-processing step before storing embeddings
  * for cosine/ANN search (unit vectors make cosine a plain dot product).
  * Output is `array<double>`; a zero vector normalizes to all zeros
  * rather than NaNs, so degenerate embeddings stay filterable.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"l2_normalize requires array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = v; ss += v * v; i += 1
    }
    val norm = math.sqrt(ss)
    if (norm > 0) { i = 0; while (i < n) { out(i) /= norm; i += 1 } }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val xi = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $out[$i] = $xi; $ss += $out[$i] * $out[$i]; }
         |double $norm = java.lang.Math.sqrt($ss);
         |if ($norm > 0) for (int $i = 0; $i < $n; $i++) $out[$i] /= $norm;
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object L2Normalize {
  /** Column-API entry point: `l2Normalize($"vec")`. */
  def apply(v: Column): Column =
    GraftSqlBridge.column(L2Normalize(GraftSqlBridge.expression(v)))
}
