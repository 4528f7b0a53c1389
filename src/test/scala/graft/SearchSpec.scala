package graft

import org.apache.spark.sql.functions._
import graft.ops.Search

/** BM25 retrieval tests: membership (only matching docs), the tf /
  * length-normalization orderings BM25 promises, and top-k shape.
  * Exact score values are covered by the x9 DuckDB oracle.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark spark spark fast"), // 3 hits, short
    (1L, "spark slow slow slow slow slow slow slow"), // 1 hit, long
    (2L, "spark slow"), // 1 hit, short
    (3L, "hash join"), // different term
    (4L, "sort merge")) // no hits
    .toDF("doc_id", "text")

  private def scores(terms: String*): Map[Long, Double] =
    Search.bm25(col("doc_id"), col("text"), terms)(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("bm25 emits exactly the docs containing a query term") {
    assert(scores("spark", "hash").keySet == Set(0L, 1L, 2L, 3L))
    assert(scores("hash").keySet == Set(3L))
  }

  test("bm25 ranks higher tf above lower tf, shorter doc above longer") {
    val m = scores("spark")
    assert(m(0L) > m(2L), s"tf 3 must beat tf 1 at shorter length: $m")
    assert(m(2L) > m(1L), s"same tf, shorter doc must rank higher: $m")
  }

  test("bm25 score is the sum of its per-term scores") {
    val both = scores("spark", "hash")
    val one = scores("spark")
    val other = scores("hash")
    // doc 3 matches only 'hash', doc 0 only 'spark' — per-doc totals add up
    assert(math.abs(both(3L) - other(3L)) < 1e-3)
    assert(math.abs(both(0L) - one(0L)) < 1e-3)
  }

  test("bm25TopK bounds the result and orders by (score desc, doc_id)") {
    val out = Search.bm25TopK(col("doc_id"), col("text"), Seq("spark", "hash"), 2)(docs)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length == 2)
    assert(out(0)._2 >= out(1)._2)
    val all = scores("spark", "hash")
    assert(out(0)._2 == all.values.max)
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrfFuseTopK fuses by rank with full-outer semantics, hand values") {
    val lex = Seq((1L, 10.0), (2L, 5.0), (3L, 1.0)).toDF("doc_id", "score")
    val sem = Seq((2L, 0.9), (4L, 0.8)).toDF("doc_id", "score")
    val out = Search.rrfFuseTopK(lex, sem, candidates = 10, k = 10)
    val m = out.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // lex ranks 1→1, 2→2, 3→3; sem ranks 2→1, 4→2
    assert(m(2L) == r6(1.0 / 62 + 1.0 / 61))
    assert(m(1L) == r6(1.0 / 61))
    assert(m(4L) == r6(1.0 / 62))
    assert(m(3L) == r6(1.0 / 63))
    // doc 2 appears in both rankings and must fuse to the top
    assert(out.collect().head.getLong(0) == 2L)
  }

  test("rrfFuseTopK applies the candidate cut before fusing") {
    val lex = Seq((1L, 10.0), (2L, 5.0), (3L, 1.0)).toDF("doc_id", "score")
    val sem = Seq((3L, 0.9)).toDF("doc_id", "score")
    val m = Search.rrfFuseTopK(lex, sem, candidates = 2, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // doc 3 is cut from the lexical candidates; only its sem rank counts
    assert(m(3L) == r6(1.0 / 61))
  }
}
