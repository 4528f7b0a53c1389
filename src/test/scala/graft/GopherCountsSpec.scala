package graft

import org.apache.spark.sql.functions._
import graft.functions.{AlphaWordCount, StopwordHits, SymbolMarkCount}
import graft.ops.Texts

/** Differential tests for the native single-pass character-class counters
  * against the regex forms they replace (which the DuckDB oracle still
  * evaluates): equality must hold on every row, including the adversarial
  * shapes — dot runs, consecutive spaces, multibyte UTF-8, empty strings,
  * stopwords at both ends and as substrings of larger words.
  */
class GopherCountsSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "",
    " ",
    "   ",
    "#",
    "...",
    "....",      // one '...' + loose dot
    ".....",     // one '...' + two loose dots
    "......",    // two '...'
    "#...#..#",  // mixed marks
    ".. .. ..",  // never three in a row
    "the",
    "the the the",
    "the  the",          // empty token between
    " the ",             // stopword at both boundaries
    "then theater bathe", // stopword as substring only — zero hits
    "of, the.",          // punctuation glued on — token inequality
    "abc 123 !!! x9z",
    "éclair naïve 日本語 test", // multibyte — bytes >= 0x80 in tokens
    "a#b...c#d",
    "№§... #",
    "be to of and that have with", // every-word-a-stopword
    "The BE To"          // case-sensitive: zero hits
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def corpus =
    adversarial.toDF("id", "text").unionByName(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").as("id"), col("text")))

  test("SymbolMarkCount == regexp_count('#|\\.\\.\\.') on every row") {
    val diff = corpus.select(
        SymbolMarkCount(col("text")).as("native"),
        regexp_count(col("text"), lit("#|\\.\\.\\.")).as("regex"))
      .filter(col("native") =!= col("regex"))
    assert(diff.count() === 0)
  }

  test("AlphaWordCount == regexp_count(' '||text, ' [^ ]*[a-zA-Z][^ ]*')") {
    val diff = corpus.select(
        AlphaWordCount(col("text")).as("native"),
        regexp_count(concat(lit(" "), col("text")),
          lit(" [^ ]*[a-zA-Z][^ ]*")).as("regex"))
      .filter(col("native") =!= col("regex"))
    assert(diff.count() === 0)
  }

  test("StopwordHits == regexp_count(stopwordCountPattern) on every row") {
    val diff = corpus.select(
        StopwordHits(col("text"), Texts.enStopwords).as("native"),
        regexp_count(col("text"), lit(Texts.stopwordCountPattern)).as("regex"))
      .filter(col("native") =!= col("regex"))
    assert(diff.count() === 0)
  }

  test("StopwordPresence == summed padded-contains probes on every row") {
    val padded = concat(lit(" "), col("text"), lit(" "))
    val probes = Texts.enStopwords
      .map(w => when(padded.contains(s" $w "), lit(1)).otherwise(lit(0)))
      .reduce(_ + _)
    val diff = corpus.select(
        graft.functions.StopwordPresence(col("text"), Texts.enStopwords).as("native"),
        probes.as("contains"))
      .filter(col("native") =!= col("contains"))
    assert(diff.count() === 0)
  }

  test("HammingDistance == aggregate(zip_with(split, split)) on key pairs") {
    // every (text, reversed-prefix text) pair from the fixture corpus,
    // plus non-ASCII and unequal-length edges
    // (the empty-vs-nonempty case is asserted on the kernel directly
    // below: split('', '') yields [''] — one REAL element — so the HOF
    // surplus arithmetic here doesn't apply to it)
    val pairs = (adversarial.map(_._2).filter(_.nonEmpty).map(t => (t, t.reverse)) ++
      Seq(("abc", "abc"), ("abc", "abd"), ("abc", "abcd"),
        ("éclair", "èclair"), ("日本語", "日本誤"), ("a日b", "a日c")))
      .toDF("k1", "k2")
    val hof = aggregate(
      zip_with(split(col("k1"), ""), split(col("k2"), ""),
        (x, y) => when(x =!= y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    // the HOF form zips to min length and ignores the surplus; the native
    // kernel counts surplus code points as differences — compare on the
    // common prefix + explicit surplus arithmetic
    val diff = pairs.select(
        graft.functions.HammingDistance(col("k1"), col("k2")).as("native"),
        (hof + abs(length(col("k1")) - length(col("k2")))).as("hof_plus_surplus"))
      .filter(col("native") =!= col("hof_plus_surplus"))
    assert(diff.count() === 0)
  }

  test("kernels: hand-computed spot values") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(graft.functions.HammingDistance.dist(u(""), u("xyz")) === 3)
    assert(graft.functions.HammingDistance.dist(u(""), u("")) === 0)
    assert(graft.functions.HammingDistance.dist(u("日本語"), u("日本誤")) === 1)
    assert(graft.functions.SymbolMarkCount.count(
      org.apache.spark.unsafe.types.UTF8String.fromString("....")) === 1)
    assert(graft.functions.SymbolMarkCount.count(
      org.apache.spark.unsafe.types.UTF8String.fromString("......")) === 2)
    assert(graft.functions.AlphaWordCount.count(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc 123 x9")) === 2)
    val set = new java.util.HashSet[String]()
    set.add("the")
    assert(graft.functions.StopwordHits.count(
      org.apache.spark.unsafe.types.UTF8String.fromString("the  the then"), set) === 2)
  }
}
