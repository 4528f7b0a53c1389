package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical (inverted-index-style) retrieval over the `documents` table:
  * BM25 scoring of a term query against the whole corpus.
  *
  * Scale design (100 TB): the classic inverted index is a (term → postings)
  * layout; the equivalent relational shape is "explode tokens, keep only
  * postings of the query's terms". The `isin(queryTerms)` filter sits in
  * the SAME whole-stage-codegen stage as the explode, so every
  * non-matching token dies before it ever hits a shuffle — what reaches
  * the (doc, term) aggregation is only the postings a real index would
  * have fetched, a ~|query|/|vocab| fraction of the token stream. All
  * per-term statistics (document frequency) and corpus constants
  * (N, avgdl) are tiny by construction and ride broadcast joins; nothing
  * about the corpus is ever collected to the driver. In a production
  * index-build the corpus constants and df table are computed once and
  * reused across queries — here each call recomputes them, which is the
  * honest benchmark of a cold retrieval.
  */
object Search {

  /** BM25 (Robertson/Spärck Jones) scores for every document matching at
    * least one query term. Emits (doc_id, score) with `score` rounded to 4
    * decimals: the per-doc score is a sum of O(|query|) double terms whose
    * addition order differs across engines/partitionings, and rounding
    * makes the result hash-stable (the established idiom for
    * float-aggregate catalog queries).
    *
    * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (non-negative form)
    * w(t,d) = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    */
  def bm25(id: Column, text: Column, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75)(df: DataFrame): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val base = df.select(id.as("doc_id"), Texts.tokens(text).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("dl"))
    // corpus constants: one scalar-aggregate row, broadcast into the plan
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    // postings of the query terms only (the inverted-index semi-join);
    // dl is functionally dependent on doc_id — grouping by it too avoids
    // a per-doc length join later
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    // document frequency per query term: <= |queryTerms| rows
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df_t"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df_t") + lit(0.5))
          / (col("df_t") + lit(0.5))))
      .withColumn("w",
        col("idf") * col("tf") * lit(k1 + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("w")), 4).as("score"))
  }

  /** BM25 top-k retrieval: [[bm25]] + `orderBy(score desc, doc_id)` +
    * `limit(k)` — Spark plans TakeOrderedAndProject (per-partition top-k,
    * single small merge; no global sort). Ordering on the ROUNDED score
    * with a doc_id tiebreak keeps the selected set engine-deterministic.
    */
  def bm25TopK(id: Column, text: Column, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75)(df: DataFrame): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    bm25(id, text, queryTerms, k1, b)(df)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Candidate ranks 1..`candidates` of a (doc_id, score) frame, ordered
    * by (score desc, doc_id). The global row_number window runs AFTER a
    * TakeOrdered limit, so the single-partition sort it implies touches
    * `candidates` rows — never the corpus. That is the honest shape of
    * rank fusion at scale: retrievers cut to top-N first, only the tiny
    * candidate set is globally ranked.
    */
  private def candidateRanks(scored: DataFrame, candidates: Int): DataFrame =
    scored.orderBy(col("score").desc, col("doc_id")).limit(candidates)
      .select(col("doc_id"),
        row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).as("rank"))

  /** HYBRID RETRIEVAL via reciprocal-rank fusion (Cormack et al.):
    * rrf(d) = Σ_retrievers 1/(kRrf + rank_r(d)), over the top-`candidates`
    * of a lexical and a semantic (doc_id, score) ranking. RRF fuses on
    * RANKS, not scores, so BM25 magnitudes and cosine magnitudes need no
    * calibration — the standard first-stage fusion in modern search.
    * Emits the top-`k` as (doc_id, lex_rank, sem_rank, rrf) with rrf
    * rounded to 6 decimals; docs missing from one ranking contribute
    * nothing for it (full-outer fusion).
    */
  def rrfFuseTopK(lexical: DataFrame, semantic: DataFrame,
      candidates: Int, k: Int, kRrf: Int = 60): DataFrame = {
    require(candidates >= 1 && k >= 1, "candidates and k must be >= 1")
    val l = candidateRanks(lexical, candidates).withColumnRenamed("rank", "lex_rank")
    val s = candidateRanks(semantic, candidates).withColumnRenamed("rank", "sem_rank")
    l.join(s, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(kRrf) + col("sem_rank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"), col("rrf"))
  }
}
