package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis extension operators
  * (SURVEY.md §2.6 X1-X4). Everything is a Catalyst Column expression (HOFs,
  * no UDFs) so pipelines stay inside whole-stage codegen and scale linearly
  * with executors — critical at the 100 TB design point where per-row Scala
  * lambdas would dominate.
  */
object Texts {

  /** Whitespace tokenizer (the `documents.text` fixture is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-token shingles ("n-grams of tokens"), the unit of
    * near-duplicate detection. Guarded for docs shorter than n (Spark's
    * `sequence(1, 0)` would yield a DESCENDING sequence, not empty).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** A BPE-ish token counter over raw text: splits on whitespace AND
    * punctuation/symbol boundaries the way byte-pair pretokenizers do
    * (letters+digits runs vs single symbols), without an external tokenizer.
    */
  def bpeishTokens(text: Column): Column =
    filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"), t => t =!= lit(" ") && t =!= lit(""))

  /** English stopword list used by the language-ID heuristic. */
  val enStopwords: Seq[String] =
    Seq("the", "of", "and", "to", "in", "a", "is", "that", "for", "on")

  /** SQL literal of [[enStopwords]] for the DuckDB oracle. */
  val enStopwordsSql: String = enStopwords.map(w => s"'$w'").mkString("(", ", ", ")")
}
