package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Partition-pruning layout tests (SURVEY §4.2 "partition pruning" row):
  * a filter on the partition column must appear as a `PartitionFilters`
  * clause on the scan and cut the files read, before any row is decoded.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("filters on partition columns prune directories at the scan") {
    val dir = Files.createTempDirectory("graft-layout").toString
    val df = Seq.tabulate(60)(i => (i.toLong, s"p${i % 3}", i * 1.5)).toDF("id", "part", "v")
    Layout.writePartitioned(df, dir, "part")

    val read = Layout.readPartitioned(spark, dir).filter(col("part") === "p1")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("isnotnull(part"), plan)
    assert(read.count() === 20)
    // pruned scan reads only the matching partition's files
    val scanned = read.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString
    assert(!scanned.contains("part=p0"), scanned)
  }

  test("partitioned round-trip preserves values and partition column typing") {
    val dir = Files.createTempDirectory("graft-layout2").toString
    val df = Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "part", "v")
    Layout.writePartitioned(df, dir, "part")
    val back = Layout.readPartitioned(spark, dir)
      .select(col("id"), col("part"), col("v")) // partition col is restored
    assert(rowsOf(back) === rowsOf(df))
  }

  test("compact rewrites a many-small-files table into the size-targeted count") {
    val dir = Files.createTempDirectory("graft-compact").toString
    // 40 partitions → 40 small files
    Seq.tabulate(2000)(i => (i.toLong, s"row $i payload"))
      .toDF("id", "payload").repartition(40).write.mode("overwrite").parquet(dir)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles.count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(dir) === 40)
    val bytes = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // target half the table per file → 2 files
    val staged = Layout.compact(spark, dir, math.max(1L, bytes / 2))
    assert(parquetFiles(staged) <= 3 && parquetFiles(staged) >= 1)
    // content survives the rewrite exactly
    assert(rowsOf(spark.read.parquet(staged)) === rowsOf(spark.read.parquet(dir)))
  }

  test("writeSorted gives each file a disjoint key range (min/max skipping layout)") {
    val dir = Files.createTempDirectory("graft-sorted").toString
    val df = Seq.tabulate(1000)(i => ((i * 7919) % 1000L, s"v$i")).toDF("k", "v")
    Layout.writeSorted(df, dir, 4, "k")
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length === 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("k")), max(col("k"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // pairwise disjoint [min, max] intervals => min/max stats prune files
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, sorted.mkString(", "))
      case _                       => ()
    }
    // content intact
    assert(rowsOf(spark.read.parquet(dir)) === rowsOf(df))
  }

  test("zorderKey interleaves bits exactly (reference implementation differential)") {
    def refInterleave(bits: Int, vals: Seq[Long]): Long =
      (for { i <- 0 until bits; j <- vals.indices }
        yield ((vals(j) >> i) & 1L) << (i * vals.size + j)).sum
    val cases = Seq(Seq(0L, 0L), Seq(1L, 0L), Seq(0L, 1L), Seq(255L, 0L),
      Seq(170L, 85L), Seq(255L, 255L), Seq(7L, 130L))
    val df = cases.map(c => (c(0), c(1))).toDF("a", "b")
      .withColumn("z", Layout.zorderKey(8)(col("a"), col("b")))
    val got = df.orderBy("a", "b").select("z").collect().map(_.getLong(0)).toSeq
    val want = cases.sortBy(c => (c(0), c(1))).map(refInterleave(8, _))
    assert(got === want)
    // three columns, and the signed-long guard
    val z3 = Seq((1L, 2L, 4L)).toDF("a", "b", "c")
      .withColumn("z", Layout.zorderKey(4)(col("a"), col("b"), col("c")))
      .select("z").collect()(0).getLong(0)
    assert(z3 === refInterleave(4, Seq(1L, 2L, 4L)))
    intercept[IllegalArgumentException] { Layout.zorderKey(32)(col("a"), col("b")) }
  }

  test("writeZOrdered bounds per-file ranges on BOTH dimensions (multi-column skipping)") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    // two independent uniform dims (deterministic permutations of 0..4095)
    val df = Seq.tabulate(4096)(i => ((i * 7919L) % 4096, (i * 104729L) % 4096, i))
      .toDF("x", "y", "payload")
    Layout.writeZOrdered(df, dir, 16, 8, "x", "y")
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length === 16)
    def spans(c: String): Seq[Long] = files.toSeq.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).collect()(0)
      r.getLong(1) - r.getLong(0)
    }
    // a 16-file z-order over two uniform dims approximates 4x4 tiles. Files
    // that straddle a major quadrant boundary of the curve can span wide
    // (Morton discontinuity), so the clustering claim is about the MEAN
    // span: well under half the range in BOTH dims — a plain sort on x
    // would leave every file spanning ~all of y (span ≈ 4095)
    val (xs, ys) = (spans("x"), spans("y"))
    assert(xs.sum / xs.size < 4096 / 2, s"x spans not clustered: $xs")
    assert(ys.sum / ys.size < 4096 / 2, s"y spans not clustered: $ys")
    // content survives the rewrite exactly
    assert(rowsOf(spark.read.parquet(dir)) === rowsOf(df))
  }

  test("compact refuses a hive-partitioned root instead of flattening it") {
    val dir = Files.createTempDirectory("graft-compact-part").toString
    val df = Seq.tabulate(20)(i => (i.toLong, s"p${i % 2}")).toDF("id", "part")
    Layout.writePartitioned(df, dir, "part")
    val err = intercept[IllegalArgumentException] {
      Layout.compact(spark, dir, 1L << 20)
    }
    assert(err.getMessage.contains("hive-partitioned"))
  }
}
