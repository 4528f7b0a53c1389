package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (natural log) of a document's token distribution,
  * computed per row in one generated-code pass — the information-density
  * quality signal of web-scale curation (near-zero entropy = a document
  * that repeats one token; high entropy relative to length = diverse
  * vocabulary). H = ln(n) − (Σ c·ln c)/n over whitespace-token counts,
  * the algebraic form that needs only the raw counts, never p = c/n per
  * term.
  *
  * The Spark-first contrast to the DuckDB oracle matters at 100 TB: the
  * oracle must explode the corpus into a token stream and aggregate it
  * twice (GROUP BY doc,term then GROUP BY doc — two shuffles of every
  * token in the corpus), while this expression is a scalar map over the
  * documents scan — ZERO shuffle, no per-token rows ever materialize,
  * and it inlines into whole-stage codegen beside the other per-doc
  * scores. Tokenization is delimiter-split on ' ' keeping empty fields
  * (Java's split-with-negative-limit semantics), exactly `split(text,
  * ' ')` / DuckDB `string_split(text, ' ')`, so token counts agree with
  * every other `Texts.tokens` consumer.
  */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_entropy requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    TokenEntropy.entropy(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenEntropy$$.MODULE$$.entropy($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TokenEntropy {

  /** Per-row kernel, called from generated code. One pass to count token
    * frequencies (open JDK HashMap with a primitive-long box reused as a
    * mutable counter), one pass over the distinct counts for Σ c·ln c.
    * Work is O(tokens) with allocation proportional to the DISTINCT
    * vocabulary of one row, not the corpus.
    */
  def entropy(text: UTF8String): Double = {
    val s = text.toString
    val counts = new java.util.HashMap[String, Array[Long]]()
    var n = 0L
    var start = 0
    var done = false
    while (!done) {
      val sp = s.indexOf(' ', start)
      val tok = if (sp < 0) s.substring(start) else s.substring(start, sp)
      val slot = counts.get(tok)
      if (slot == null) counts.put(tok, Array(1L)) else slot(0) += 1L
      n += 1L
      if (sp < 0) done = true else start = sp + 1
    }
    if (n <= 1L) return 0.0
    var sumClnC = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      sumClnC += c * Math.log(c)
    }
    Math.log(n.toDouble) - sumClnC / n.toDouble
  }

  /** Column-API entry point: `TokenEntropy($"text")`. */
  def apply(text: Column): Column =
    GraftSqlBridge.column(TokenEntropy(GraftSqlBridge.expression(text)))
}
