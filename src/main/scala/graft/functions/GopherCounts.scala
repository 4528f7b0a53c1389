package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass character-class counters for the Gopher-rule /
  * quality-scoring family — drop-in replacements for the three
  * `regexp_count` scans that dominated the map-only text entries once the
  * bench started forcing every output column (~35 µs/doc of regex
  * machinery per scan at sf0.1).
  *
  * Each kernel is one branch-light pass over the UTF8String's BYTES (the
  * classes involved — '#', '.', ' ', [a-zA-Z] — are all ASCII, and UTF-8
  * continuation bytes are >= 0x80, so byte comparison can never
  * false-positive inside a multibyte character). No Pattern compilation,
  * no Matcher allocation, no backtracking; inlines into whole-stage
  * codegen beside the other per-doc scores. At 100 TB these entries are
  * scan-bound, which is the design goal.
  *
  * Equivalence contracts (differential-tested in GopherCountsSpec and
  * re-proven by every oracle run, since the DuckDB side still uses the
  * regex form):
  *  - [[SymbolMarkCount]] == `regexp_count(text, '#|\\.\\.\\.')` —
  *    left-to-right non-overlapping scan, '#' and '...' never compete
  *    for the same start position.
  *  - [[AlphaWordCount]] == `regexp_count(' ' || text, ' [^ ]*[a-zA-Z][^ ]*')`
  *    — each match consumes exactly one space-delimited token, so the
  *    count is "tokens containing an ASCII letter".
  *  - [[StopwordHits]] == `regexp_count(text, '(?:^| )(?:w1|...|wN)(?= |\\z)')`
  *    ([[graft.ops.Texts.stopwordCountPattern]]) — the anchors make each
  *    match a whole token, so the count is "tokens equal to a list word"
  *    (exact, case-sensitive).
  */
case class SymbolMarkCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"symbol_mark_count requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    SymbolMarkCount.count(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SymbolMarkCount$$.MODULE$$.count($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SymbolMarkCount {

  /** Non-overlapping '#' | '...' occurrences, regex scan order: a match
    * advances past what it consumed ("...." counts one '...' plus an
    * unmatched dot, exactly like the regex).
    */
  def count(text: UTF8String): Int = {
    val n = text.numBytes
    var i = 0
    var c = 0
    while (i < n) {
      val b = text.getByte(i)
      if (b == '#') { c += 1; i += 1 }
      else if (b == '.' && i + 2 < n &&
          text.getByte(i + 1) == '.' && text.getByte(i + 2) == '.') {
        c += 1; i += 3
      } else i += 1
    }
    c
  }

  def apply(text: Column): Column =
    GraftSqlBridge.column(SymbolMarkCount(GraftSqlBridge.expression(text)))
}

case class AlphaWordCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"alpha_word_count requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    AlphaWordCount.count(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AlphaWordCount$$.MODULE$$.count($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object AlphaWordCount {

  /** Space-delimited tokens containing at least one ASCII letter. Empty
    * tokens (consecutive spaces) contain none and never count — same as
    * the regex, whose `[^ ]*[a-zA-Z][^ ]*` needs the letter.
    */
  def count(text: UTF8String): Int = {
    val n = text.numBytes
    var i = 0
    var c = 0
    var hasAlpha = false
    while (i < n) {
      val b = text.getByte(i)
      if (b == ' ') {
        if (hasAlpha) c += 1
        hasAlpha = false
      } else if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z'))
        hasAlpha = true
      i += 1
    }
    if (hasAlpha) c += 1
    c
  }

  def apply(text: Column): Column =
    GraftSqlBridge.column(AlphaWordCount(GraftSqlBridge.expression(text)))
}

/** Count of tokens exactly equal to a word in `stopwords` (case-sensitive,
  * single-space tokenization — the [[graft.ops.Texts.tokens]] convention).
  * The word set rides into generated code as a referenced object, built
  * once per expression instance, probed per token — O(tokens) per row
  * with no regex alternation scan over the list.
  */
case class StopwordHits(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"stopword_hits requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    StopwordHits.count(text.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwordSet", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StopwordHits$$.MODULE$$.count($c, $setRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object StopwordHits {

  def count(text: UTF8String, words: java.util.HashSet[String]): Int = {
    val s = text.toString
    var c = 0
    var start = 0
    var done = false
    while (!done) {
      val sp = s.indexOf(' ', start)
      val tok = if (sp < 0) s.substring(start) else s.substring(start, sp)
      if (words.contains(tok)) c += 1
      if (sp < 0) done = true else start = sp + 1
    }
    c
  }

  def apply(text: Column, stopwords: Seq[String]): Column =
    GraftSqlBridge.column(
      StopwordHits(GraftSqlBridge.expression(text), stopwords))
}

/** Count of DISTINCT `words` present as whole tokens (presence, not
  * occurrences — the Gopher "at least 2 required stopwords" rule).
  * Replaces the N padded-`contains` probes (each probe re-scans the whole
  * text, so the old form was N passes; this is one): word → bit index in
  * a long mask, popcount at the end. Capped at 64 words — the rule's
  * lists are single-digit sized.
  */
case class StopwordPresence(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  require(stopwords.size <= 64,
    s"stopword_presence supports at most 64 words, got ${stopwords.size}")

  @transient private lazy val wordIndex: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](stopwords.size * 2)
    stopwords.zipWithIndex.foreach { case (w, i) => m.put(w, i) }
    m
  }

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"stopword_presence requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    StopwordPresence.count(text.asInstanceOf[UTF8String], wordIndex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("stopwordIndex", wordIndex, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StopwordPresence$$.MODULE$$.count($c, $mapRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object StopwordPresence {

  def count(text: UTF8String, index: java.util.HashMap[String, Integer]): Int = {
    val s = text.toString
    var mask = 0L
    var start = 0
    var done = false
    while (!done) {
      val sp = s.indexOf(' ', start)
      val tok = if (sp < 0) s.substring(start) else s.substring(start, sp)
      val i = index.get(tok)
      if (i != null) mask |= 1L << i.intValue()
      if (sp < 0) done = true else start = sp + 1
    }
    java.lang.Long.bitCount(mask)
  }

  def apply(text: Column, stopwords: Seq[String]): Column =
    GraftSqlBridge.column(
      StopwordPresence(GraftSqlBridge.expression(text), stopwords))
}
