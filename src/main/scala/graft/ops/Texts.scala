package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis extension operators
  * (SURVEY.md §2.6 X1-X4). Everything is a Catalyst Column expression (no
  * UDFs). Performance note that shapes every hot path here: lambda
  * higher-order functions (`transform`, `aggregate`, `filter`) are
  * `CodegenFallback` in Spark — they evaluate INTERPRETED, row by row, and
  * the optimizer happily duplicates them into inferred filters (measured
  * ~15× slower than generated code on the shingle pipeline). So bulk paths
  * (shingling) are expressed as explode + plain codegen'd expressions, and
  * lambda HOFs are reserved for cheap one-pass per-row scoring.
  */
object Texts {

  /** Whitespace tokenizer (the `documents.text` fixture is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-token shingles ("n-grams of tokens"), the unit of
    * near-duplicate detection. Guarded for docs shorter than n (Spark's
    * `sequence(1, 0)` would yield a DESCENDING sequence, not empty).
    *
    * Array-valued scalar form, lambda-HOF based (interpreted) — fine for
    * single-pass per-row use; bulk pipelines use [[explodedShingles]].
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Raw (id, shingle) pairs for the whole corpus (duplicates per doc kept),
    * built WITHOUT lambda HOFs: explode the shingle start positions (a cheap
    * int sequence), then assemble each shingle with `slice` + `concat_ws` —
    * both codegen'd. This is the bulk-path form of [[shingles]]: one
    * generated-code pass over the corpus, instead of per-row interpreted
    * lambda evaluation (which the optimizer additionally re-evaluates in
    * filters it infers below the explode).
    *
    * Callers pick the de-dup/partitioning axis that their downstream plan
    * reuses: `repartition($"s").dropDuplicates("id","s")` for shingle-keyed
    * self-joins (one exchange serves distinct, DF-count window AND the pair
    * join — `HashPartitioning(s)` satisfies all three), or
    * `repartition($"id")` for per-doc signatures/sizes.
    */
  def explodedShingles(df: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val toks = df.select(id.as("id"), split(text, " ").as("toks"))
      .filter(size(col("toks")) >= n)
    toks
      .select(col("id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - (n - 1))).as("i"))
      .select(col("id"), concat_ws(" ", slice(col("toks"), col("i"), lit(n))).as("s"))
  }

  /** A BPE-ish tokenizer over raw text: maximal letter+digit runs plus
    * single non-space symbols, the way byte-pair pretokenizers split,
    * without an external tokenizer. `regexp_extract_all` is a plain
    * (codegen'd) expression and the same pattern runs verbatim in DuckDB,
    * so it is oracle-checkable — unlike a lambda-HOF filter over split().
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), lit(0))

  /** English stopword list used by the language-ID heuristic. */
  val enStopwords: Seq[String] =
    Seq("the", "of", "and", "to", "in", "a", "is", "that", "for", "on")

  /** SQL literal of [[enStopwords]] for the DuckDB oracle. */
  val enStopwordsSql: String = enStopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Regex counting whitespace-delimited stopword tokens: each match is a
    * full token (anchored on start-of-string/space before, space/end after,
    * with a lookahead so adjacent stopwords both count). For text split on
    * single spaces this counts exactly the tokens `t` with
    * `t IN enStopwords` — the codegen'd (`regexp_count`) equivalent of the
    * interpreted `size(filter(toks, _.isInCollection(...)))` lambda HOF.
    * `\z` (true end of input), NOT `$`: Java's `$` also matches before a
    * FINAL line terminator, which would count a trailing "the\n" that
    * token-equality (and hence the DuckDB oracles) does not.
    */
  val stopwordCountPattern: String =
    enStopwords.mkString("(?:^| )(?:", "|", ")(?= |\\z)")
}
