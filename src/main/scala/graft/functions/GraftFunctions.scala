package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Add, And, ArrayDistinct, Cast,
  Divide, Expression, ExpressionInfo, GreaterThanOrEqual, Length, LessThanOrEqual,
  Literal, Multiply, RegExpReplace, Round, Size, StringSplit, StringTrim,
  Subtract, Lower}
import org.apache.spark.sql.types.DoubleType

/** SQL-surface registration for graft's native expressions, so SQL users
  * get them alongside the Column API:
  *
  *  - config route: `spark.sql.extensions=graft.functions.GraftSparkExtensions`
  *    (the standard plug-in point — injected at session build);
  *  - programmatic route: `GraftFunctions.register(spark)` on a live session.
  *
  * After either, `spark.sql("SELECT cosine_similarity(a, b) ...")` and
  * `dot_product(a, b)` resolve to the codegen'd expressions.
  */
object GraftFunctions {

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> {
      case Seq(a, b) => CosineSimilarity(a, b)
      case other => throw new IllegalArgumentException(
        s"cosine_similarity expects 2 arguments, got ${other.size}")
    },
    "dot_product" -> {
      case Seq(a, b) => DotProduct(a, b)
      case other => throw new IllegalArgumentException(
        s"dot_product expects 2 arguments, got ${other.size}")
    },
    "l2_normalize" -> {
      case Seq(v) => L2Normalize(v)
      case other => throw new IllegalArgumentException(
        s"l2_normalize expects 1 argument, got ${other.size}")
    },
    // Text ops re-exposed to SQL as directly-constructed catalyst trees
    // (registry builders must return resolvable Expressions — a Column
    // composition stays an unresolved ColumnNode there). Same arithmetic
    // and the same literals as the Column API in ops.TextAnalysis; the
    // SimilaritySpec SQL test pins the two surfaces to identical values.
    "quality_score" -> {
      case Seq(t) => qualityScoreExpr(t)
      case other => throw new IllegalArgumentException(
        s"quality_score expects 1 argument, got ${other.size}")
    },
    "redact_pii" -> {
      case Seq(t) => graft.ops.TextAnalysis.piiPatterns.foldLeft(t) {
        case (e, (pat, tag)) => RegExpReplace(e, Literal(pat), Literal(tag))
      }
      case other => throw new IllegalArgumentException(
        s"redact_pii expects 1 argument, got ${other.size}")
    },
    "normalize_text" -> {
      case Seq(t) => StringTrim(RegExpReplace(
        RegExpReplace(Lower(t),
          Literal(graft.ops.TextAnalysis.normalizeStripPattern), Literal(" ")),
        Literal(graft.ops.TextAnalysis.normalizeSqueezePattern), Literal(" ")))
      case other => throw new IllegalArgumentException(
        s"normalize_text expects 1 argument, got ${other.size}")
    },
    // round-9 native single-pass text kernels (same expressions the
    // Column API uses — SQL callers get the codegen'd byte-scan forms)
    "hamming_distance" -> {
      case Seq(a, b) => HammingDistance(a, b)
      case other => throw new IllegalArgumentException(
        s"hamming_distance expects 2 arguments, got ${other.size}")
    },
    "alpha_word_count" -> {
      case Seq(t) => AlphaWordCount(t)
      case other => throw new IllegalArgumentException(
        s"alpha_word_count expects 1 argument, got ${other.size}")
    },
    "symbol_mark_count" -> {
      case Seq(t) => SymbolMarkCount(t)
      case other => throw new IllegalArgumentException(
        s"symbol_mark_count expects 1 argument, got ${other.size}")
    },
    // 1-arg form counts tokens in the English stopword profile (the
    // list is a Scala-side parameter; SQL gets the library default)
    "stopword_hits" -> {
      case Seq(t) => StopwordHits(t, graft.ops.Texts.enStopwords)
      case other => throw new IllegalArgumentException(
        s"stopword_hits expects 1 argument, got ${other.size}")
    },
    // distinct-stopword presence count (the Gopher ">= 2 required words"
    // probe) — same English profile default as stopword_hits
    "stopword_presence" -> {
      case Seq(t) => StopwordPresence(t, graft.ops.Texts.enStopwords)
      case other => throw new IllegalArgumentException(
        s"stopword_presence expects 1 argument, got ${other.size}")
    },
    // the full Gopher hard-rule conjunction at library defaults — the SQL
    // twin of ops.TextAnalysis.gopherPassExpr (same sub-expressions, same
    // literals, same rule order; EngineSpec pins the surfaces bit-equal)
    "gopher_pass" -> {
      case Seq(t) => gopherPassSqlExpr(t)
      case other => throw new IllegalArgumentException(
        s"gopher_pass expects 1 argument, got ${other.size}")
    })

  /** Catalyst form of [[graft.ops.TextAnalysis.qualityExpr]] — identical
    * sub-expressions and combination order, so SQL and Column results are
    * bit-equal.
    */
  private def qualityScoreExpr(text: Expression): Expression = {
    def dbl(e: Expression) = Cast(e, DoubleType)
    val toks = StringSplit(text, Literal(" "), Literal(-1))
    val n = dbl(Size(toks))
    val diversity = Divide(dbl(Size(ArrayDistinct(toks))), n)
    // same native kernel as the Column API's qualityParts (count-equal to
    // the stopwordCountPattern regex — GopherCountsSpec), so the two
    // surfaces stay bit-equal
    val stopRatio = Divide(
      dbl(StopwordHits(text, graft.ops.Texts.enStopwords)), n)
    val meanLen = Divide(
      dbl(Subtract(Length(text), Subtract(Size(toks), Literal(1)))), n)
    Add(Add(Multiply(diversity, Literal(0.5)), Multiply(stopRatio, Literal(0.25))),
      Multiply(meanLen, Literal(0.05)))
  }

  /** Catalyst form of [[graft.ops.TextAnalysis.gopherPassExpr]] at its
    * library defaults (gopherStopwords, 50..100000 words) — identical
    * sub-expressions, rounding grain, and cheapest-first rule order, so
    * the SQL verdicts are bit-equal to the Column API's and boolean AND
    * still short-circuits the byte scans in generated code.
    */
  private def gopherPassSqlExpr(text: Expression): Expression = {
    def dbl(e: Expression) = Cast(e, DoubleType)
    def between(e: Expression, lo: Expression, hi: Expression) =
      And(GreaterThanOrEqual(e, lo), LessThanOrEqual(e, hi))
    def r4(e: Expression) = new Round(e, Literal(4))
    val toks = StringSplit(text, Literal(" "), Literal(-1))
    val nWords = Size(toks)
    val n = dbl(nWords)
    val meanLen = Divide(dbl(Subtract(Length(text), Subtract(nWords, Literal(1)))), n)
    val stopHits = StopwordPresence(text, graft.ops.TextAnalysis.gopherStopwords)
    val symbolRatio = Divide(dbl(SymbolMarkCount(text)), n)
    val alphaRatio = Divide(dbl(AlphaWordCount(text)), n)
    And(And(And(And(
      between(nWords, Literal(50), Literal(100000)),
      between(r4(meanLen), Literal(3.0), Literal(10.0))),
      GreaterThanOrEqual(stopHits, Literal(2))),
      LessThanOrEqual(r4(symbolRatio), Literal(0.1))),
      GreaterThanOrEqual(r4(alphaRatio), Literal(0.8)))
  }

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getName, name)

  /** Register into a live session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info(name), exprs => builder(exprs))
    }
  }

  /** For [[GraftSparkExtensions]]: the injectable (name, info, builder) triples. */
  private[functions] def injectable
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    functions.map { case (name, b) => (FunctionIdentifier(name), info(name), b) }
}

/** `spark.sql.extensions` entry point (SURVEY §4.2: the only sanctioned
  * planner hook this engine needs — function injection; zero custom
  * rules/strategies).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.injectable.foreach { case (ident, inf, builder) =>
      ext.injectFunction((ident, inf, builder))
    }
}
