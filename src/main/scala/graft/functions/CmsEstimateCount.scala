package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.util.sketch.CountMinSketch

/** Native codegen'd count-min-sketch probe: `estimateCount(item)` against a
  * driver-built token sketch — the map-side prefilter of the
  * sketch-prune-then-confirm heavy-hitter play
  * ([[graft.ops.TextAnalysis.heavyHitters]]). The same role Spark's own
  * `BloomFilterMightContain` fills for runtime row-level Bloom pushdown
  * ([[graft.ops.Dedup.decontaminateBloom]]); Spark has no CMS twin, so
  * this is it.
  *
  * The sketch rides the expression as a plain reference: `CountMinSketchImpl`
  * is `java.io.Serializable`, the generated code binds it through
  * `addReferenceObj`, and Spark broadcasts the serialized task binary once
  * per stage — so a several-hundred-KB sketch ships once per stage (exactly
  * like the Bloom play's binary literal), is probed with ZERO per-row
  * deserialization or UDF boundary, and no per-call `SparkContext.broadcast`
  * handle can accumulate across a long-lived session.
  *
  * The probe string hashes exactly as the builder
  * ([[graft.ops.TextAnalysis.buildTokenCms]], `df.stat.countMinSketch`)
  * added it: both sides route through the sketch's UTF-8 string path, so
  * estimates are identical to the former per-row-UDF probe.
  */
case class CmsEstimateCount(child: Expression, cms: CountMinSketch)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate_count requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(item: Any): Any =
    cms.estimateCount(item.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmsRef = ctx.addReferenceObj("cms", cms,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, item =>
      s"${ev.value} = $cmsRef.estimateCount($item.toString());")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CmsEstimateCount {
  /** Column-API entry point: `CmsEstimateCount($"token", cms)`. */
  def apply(item: Column, cms: CountMinSketch): Column =
    GraftSqlBridge.column(
      CmsEstimateCount(GraftSqlBridge.expression(item), cms))
}
