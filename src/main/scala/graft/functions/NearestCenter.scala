package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd nearest-center assignment: for a vector row, the
  * 0-based index of the best center under argmax of
  * `dot(vec, centers(c)) - offsets(c)` plus that best score, as a
  * `struct<bucket int, score double>`. First-max tiebreak = lowest
  * center id (the same deterministic rule as `array_position`'s
  * first-occurrence in the unrolled formulation it replaces).
  *
  * WHY an expression and not `array(k × DotProduct(vec, typedlit))`:
  * the unrolled form embeds per-center primitive literals (the
  * `- |c|²/2` offsets, and k distinct array literals) in the generated
  * SOURCE, so every k-means round — new center values — produces new
  * source and a full janino recompile of a class that grows with k
  * (measured ~5.6 s/round at k=142, ~11× the k=8 cost, making sqrt-N
  * training compile-bound). Here the center matrix and offsets ride as
  * `addReferenceObj` references: the generated source is IDENTICAL
  * across rounds, k values and center contents — one compile ever,
  * shared through the codegen cache by every training round and every
  * serving query. The per-row work is the same k·dim multiply-adds, in
  * a tight primitive loop over a plain `double[][]`.
  *
  * Accumulation is double-precision left-to-right per center — the same
  * order as [[DotProduct]] — so scores are bit-identical to the
  * unrolled `DotProduct(vec, lit(c)) - lit(offset)` twin (pinned in
  * ClusteringSpec). NaN scores never win the argmax (Java `>`), whereas
  * the old `array_max` ranked NaN above everything; zero-norm inputs
  * are guarded out before assignment everywhere this is used.
  */
case class NearestCenter(child: Expression, centers: Array[Array[Double]],
    offsets: Array[Double]) extends UnaryExpression {

  require(centers.nonEmpty && centers.length == offsets.length,
    s"need matching non-empty centers/offsets, got ${centers.length}/${offsets.length}")

  override def dataType: DataType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_center requires array<float|double>, got ${other.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val xf = elemIsFloat
    var best = -1
    var bestScore = 0.0
    var c = 0
    while (c < centers.length) {
      val cc = centers(c)
      val n = math.min(x.numElements(), cc.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        dot += xi * cc(i)
        i += 1
      }
      val s = dot - offsets(c)
      if (best < 0 || s > bestScore) { best = c; bestScore = s }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestScore))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centers", centers, "double[][]")
    val oRef = ctx.addReferenceObj("offsets", offsets, "double[]")
    val xi = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestScore")
      val c = ctx.freshName("c")
      val cc = ctx.freshName("cc")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $best = -1;
         |double $bestS = 0.0;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double[] $cc = $cRef[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cc.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $v.$xi($i)) * $cc[$i];
         |  }
         |  double $s = $dot - $oRef[$c];
         |  if ($best < 0 || $s > $bestS) { $best = $c; $bestS = $s; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$best, $bestS});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCenter {
  /** Column-API entry point; offsets default to all-zero (spherical:
    * score = plain dot = cosine for unit inputs).
    */
  def apply(vec: Column, centers: Array[Array[Double]],
      offsets: Array[Double]): Column =
    GraftSqlBridge.column(
      NearestCenter(GraftSqlBridge.expression(vec), centers, offsets))
}
