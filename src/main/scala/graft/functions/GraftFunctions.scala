package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
    })

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
