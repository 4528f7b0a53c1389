package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate flowing into [[TopKByScore]]. */
final case class Scored(score: Double, id: Long)

/** Bounded top-k aggregate: keeps the k highest-scoring (score, id) pairs,
  * ties broken by lowest id; `finish` emits them best-first.
  *
  * This is the partial-top-k building block for distributed similarity
  * search: used as `groupBy(qid).agg(topK(...))`, Spark's partial
  * aggregation bounds every map-side buffer at k entries, so the shuffle
  * carries at most k rows per (query, mapper) — instead of the full
  * candidate set per query that a `Window.partitionBy(qid)` rank pushes
  * onto a single reducer.
  *
  * Ordering detail: scores are compared with `java.lang.Double.compare`,
  * which ranks NaN above all values — identical to Spark SQL's `DESC`
  * ordering on doubles, so results match the window-rank formulation
  * bit for bit.
  */
class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  // best-first: higher score first, then lower id
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }
  private def sortBounded(s: Seq[Scored]): Seq[Scored] =
    s.sortWith(better).take(k)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.size >= k && better(buf.last, a)) buf else sortBounded(buf :+ a)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    sortBounded(b1 ++ b2)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopKByScore {
  /** Column-API entry point: `topK(3)($"sim", $"id")` → `array<struct<score,id>>`. */
  def apply(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKByScore(k), ExpressionEncoder[Scored]()).apply(score, id)
}
