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
}
