package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Dedup, Relational}
import graft.functions.TopKByScore

/** Property-based invariants (SURVEY §5.2.4), driven by scalacheck
  * generators with a fixed seed (deterministic CI). Sample counts are kept
  * small — each property round-trips through a Spark job.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic mini-forAll: evaluate `f` on `n` generated samples. */
  private def forAllSamples[A](gen: Gen[A], n: Int = 5)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator failed at sample $i")))
    }

  private val wordGen = Gen.oneOf("a", "bb", "ccc", "dd", "e")
  private val rowsGen = Gen.listOfN(8,
    Gen.zip(Gen.choose(0L, 5L), Gen.listOfN(4, wordGen)))

  test("P3 explode row count equals the sum of array sizes") {
    forAllSamples(rowsGen) { rows =>
      val df = rows.toDF("id", "arr")
      val exploded = Relational.flatMapValues(Seq(col("id")), col("arr"), "x")(df)
      assert(exploded.count() === rows.map(_._2.size).sum.toLong)
    }
  }

  test("P1 filter output is a subset of its input") {
    forAllSamples(Gen.listOfN(10, Gen.choose(-100, 100))) { xs =>
      val df = xs.zipWithIndex.map(_.swap).toDF("id", "v")
      val out = Relational.filterRecords(col("v") >= 0)(df)
      assert(rowsOf(out).subsetOf(rowsOf(df)))
    }
  }

  test("G2 counts sum to the input row count") {
    forAllSamples(Gen.listOfN(12, Gen.choose(0L, 3L))) { keys =>
      val df = keys.toDF("k")
      val counts = Relational.countByKey(col("k"), "k")(df)
      assert(counts.agg(sum("cnt")).collect()(0).getLong(0) === keys.size.toLong)
    }
  }

  test("X1 exact dedup is idempotent and keeps one survivor per key") {
    forAllSamples(Gen.listOfN(10, Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 3L)))) { rows =>
      val df = rows.toDF("id", "k")
      val once = Dedup.exact(Seq(col("k")), col("id"))(df)
      val twice = Dedup.exact(Seq(col("k")), col("id"))(once)
      assert(rowsOf(once) === rowsOf(twice))
      assert(once.count() === rows.map(_._2).distinct.size.toLong)
    }
  }

  test("asofJoin equals the naive per-row latest-at-or-before computation") {
    // random (key, ts) on both sides with deliberate collisions, so ties
    // across and within sides and missing keys all get exercised
    val sideGen = Gen.listOfN(10, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 5L)))
    forAllSamples(Gen.zip(sideGen, sideGen)) { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
        .toDF("k", "lts", "lid")
      val right = rs.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong, s"v$i") }
        .toDF("k", "rts", "rid", "rv")
      val out = Relational.asofJoin(right, Seq("k"), "lts", "rts",
        Seq("rid", "rv"), "rid")(left)
        .collect().map(r => (r.getLong(2),
          if (r.isNullAt(3)) null else (r.getLong(3), r.getString(4)))).toMap
      // naive reference: per left row, the matching right rows at-or-before,
      // latest ts first, greatest rid breaking ties
      val expected = ls.zipWithIndex.map { case ((k, lts), i) =>
        val m = rs.zipWithIndex
          .filter { case ((rk, rts), _) => rk == k && rts <= lts }
          .sortBy { case ((_, rts), ri) => (-rts, -ri) }
          .headOption.map { case (_, ri) => (ri.toLong, s"v$ri") }.orNull
        i.toLong -> m
      }.toMap
      assert(out === expected)
    }
  }

  test("TopKByScore output is bounded by k, sorted best-first, and contains the max") {
    forAllSamples(Gen.listOfN(15, Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0L, 100L)))) { rows =>
      val df = rows.toDF("score", "id")
      val hits = df.agg(TopKByScore(3)(col("score"), col("id")).as("hits"))
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      assert(hits.size === math.min(3, rows.size))
      val scores = hits.map(_.getDouble(0))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
      assert(scores.head === rows.map(_._1).max)
    }
  }

  private val docGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))

  test("dupNgramStats: an exact duplicate forces dup_frac 1.0 on both copies") {
    forAllSamples(Gen.listOfN(3, docGen)) { texts =>
      // docs 0 and 1 are the same text; doc 2 is independent
      val df = (Seq(texts.head, texts.head) ++ texts.drop(2))
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val out = Dedup.dupNgramStats(col("id"), col("text"), 3)(df)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(out(0L) === 1.0)
      assert(out(1L) === 1.0)
    }
  }

  test("zorderKey matches the reference interleave on random widths and values") {
    def refInterleave(bits: Int, vals: Seq[Long]): Long =
      (for { i <- 0 until bits; j <- vals.indices }
        yield ((vals(j) >> i) & 1L) << (i * vals.size + j)).sum
    val caseGen = for {
      bits <- Gen.choose(1, 8)
      k <- Gen.choose(2, 3)
      vals <- Gen.listOfN(4, Gen.listOfN(k, Gen.choose(0L, (1L << bits) - 1)))
    } yield (bits, vals)
    forAllSamples(caseGen) { case (bits, vals) =>
      val cols = vals.head.indices.map(j => col(s"c$j"))
      val df = if (vals.head.size == 2) vals.map(v => (v(0), v(1))).toDF("c0", "c1")
        else vals.map(v => (v(0), v(1), v(2))).toDF("c0", "c1", "c2")
      val want = vals.sortBy(v => v.mkString(","))
      // sort rows identically on both sides before comparing
      val gotSorted = df.withColumn("z", graft.ops.Layout.zorderKey(bits)(cols: _*))
        .collect().map(r => (cols.indices.map(r.getLong).toList, r.getLong(cols.size)))
        .sortBy(_._1.mkString(",")).map(_._2).toSeq
      val wantZ = want.map(v => refInterleave(bits, v))
      assert(gotSorted === wantZ)
    }
  }

  test("mixtureRates are in [0,1], 1 exactly when the ask covers the source") {
    val g = for {
      total <- Gen.choose(1L, 100000L)
      w <- Gen.choose(1, 99).map(_ / 100.0)
      budget <- Gen.choose(1L, 200000L)
    } yield (total, w, budget)
    forAllSamples(g, n = 12) { case (total, w, budget) =>
      val rates = graft.ops.TextAnalysis.mixtureRates(
        Map("s" -> total), Map("s" -> w), budget)
      val r = rates("s")
      assert(r >= 0.0 && r <= 1.0, s"rate $r out of range")
      // same float expression as the implementation — a rearranged form
      // (budget*w >= total) could disagree with it at the exact boundary
      if (budget.toDouble * w / total.toDouble >= 1.0) assert(r === 1.0)
      else assert(r < 1.0)
    }
  }

  test("resampleFfill grids are contiguous, step-aligned, and carry only observed values") {
    val obsGen = Gen.listOfN(10,
      Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 200L), Gen.choose(0, 9).map(_.toDouble)))
    forAllSamples(obsGen) { obs =>
      val df = obs.toDF("k", "us", "v")
      val out = graft.ops.Timeseries.resampleFfill(col("k"), col("us"), col("v"), 25L)(df)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      val byKey = out.groupBy(_._1)
      obs.groupBy(_._1).foreach { case (k, rows) =>
        val cells = byKey(k).map(_._2).sorted
        val lo = rows.map(_._2).min / 25L * 25L
        val hi = rows.map(_._2).max / 25L * 25L
        assert(cells === (lo to hi by 25L).toSeq, s"key $k grid not contiguous")
        val observed = rows.map(_._3).toSet
        assert(byKey(k).map(_._3).forall(observed), s"key $k invented a value")
      }
    }
  }

  test("bm25 extra occurrence of a query term never lowers that doc's score") {
    forAllSamples(docGen) { text =>
      val base = Seq((0L, text + " qterm"), (1L, "other words entirely"))
      val boosted = Seq((0L, text + " qterm qterm"), (1L, "other words entirely"))
      def score(rows: Seq[(Long, String)]): Double =
        graft.ops.Search.bm25(col("id"), col("text"), Seq("qterm"))(
          rows.toDF("id", "text"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
          .getOrElse(0L, 0.0)
      // same corpus stats shape, one more tf: monotone non-decreasing
      // (tf saturation means it can plateau, never drop)
      assert(score(boosted) >= score(base) - 1e-9)
    }
  }

  test("samplePerSource sizes are exactly min(k, |stratum|) for random corpora") {
    val corpusGen = Gen.listOfN(20,
      Gen.zip(Gen.choose(1L, 1000L), Gen.oneOf("s1", "s2", "s3")))
      .map(_.distinctBy(_._1))
    forAllSamples(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "source")
      val k = 3
      val expected = rows.groupBy(_._2).view.mapValues(g => math.min(k, g.size).toLong).toMap
      val got = graft.ops.TextAnalysis.samplePerSource(
          col("doc_id"), col("source"), "sP", k)(df)
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    }
  }

  test("gopherPassExpr agrees with the flag-column product on random texts") {
    val textGen = Gen.listOfN(60, Gen.oneOf(
      "the", "a", "of", "word", "supercalifragilistic", "####", "...", "x1"))
      .map(_.mkString(" "))
    forAllSamples(Gen.listOfN(6, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val viaCols = graft.ops.TextAnalysis.gopherRules(col("doc_id"), col("text"))(df)
        .select(col("doc_id"), (col("pass") === 1).as("p"))
      val viaExpr = df.select(col("doc_id"),
        graft.ops.TextAnalysis.gopherPassExpr(col("text")).as("p"))
      assert(rowsOf(viaCols) === rowsOf(viaExpr))
    }
  }

  test("embeddingOutliers: outlier mass respects Chebyshev, flags re-derive from output") {
    val vecGen = Gen.listOfN(30,
      Gen.listOfN(4, Gen.choose(-5, 5).map(_.toFloat)))
      .map(_.filter(v => v.exists(_ != 0f)))
    forAllSamples(vecGen) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val m = graft.ops.Clustering.KMeansModel(
        Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, -1.0, 0.0, 0.0)), Nil, 0)
      val out = graft.ops.Clustering.embeddingOutliers(
          df, col("vec_id"), col("embedding"), m)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getInt(3)))
      out.groupBy(_._1).foreach { case (_, members) =>
        val frac = members.count(_._3 == 1).toDouble / members.size
        assert(frac <= 0.25, s"Chebyshev violated: $frac")
        // re-derive the threshold from the emitted integers
        val n = members.size.toDouble
        val s1 = members.map(_._2).sum.toDouble
        val s2 = members.map(x => x._2 * x._2).sum.toDouble
        val thr = s1 / n - 2.0 * math.sqrt(math.max(s2 / n - math.pow(s1 / n, 2), 0.0))
        members.foreach { case (_, sim, flag) =>
          assert(flag === (if (sim.toDouble < thr) 1 else 0))
        }
      }
    }
  }
}
