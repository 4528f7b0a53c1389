package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compression ratio of a document's UTF-8 bytes — the
  * repetitiveness signal of Gopher/CCNet-style curation (machine-generated
  * or template text compresses far below natural language; a ratio near
  * zero means the document is mostly repeats, while typical prose sits
  * well above it). Emitted as compressed/raw — smaller = more repetitive.
  *
  * A scalar codegen pass over the documents scan, zero shuffle, like
  * [[TokenEntropy]] — but where entropy sees only the unigram token
  * histogram, DEFLATE's LZ77 window catches phrase- and block-level
  * repetition (a doc that repeats a 50-token paragraph has high token
  * entropy and a tell-tale low compression ratio). No SQL engine
  * expresses this, so the catalog pairs it with an oracle-checked
  * invariant twin instead of a value oracle.
  *
  * Deterministic: fixed level, raw (nowrap) stream, single `setInput` +
  * `finish` drive — zlib's output is a pure function of (input, level,
  * strategy); the per-thread Deflater is `reset()` between rows so no
  * state crosses documents. Work is O(bytes); the compressed output is
  * counted and discarded, never materialized beyond one 8 KiB buffer.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    DeflateRatio.ratio(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateRatio$$.MODULE$$.ratio($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DeflateRatio {

  /** One Deflater per executor thread, reset between rows — Deflater holds
    * native zlib state, so per-row allocation would thrash native memory.
    */
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  /** Per-row kernel, called from generated code. Empty input → 1.0 (no
    * compression evidence, neutral score).
    */
  def ratio(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.length == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** Column-API entry point: `DeflateRatio($"text")`. */
  def apply(text: Column): Column =
    GraftSqlBridge.column(DeflateRatio(GraftSqlBridge.expression(text)))
}
