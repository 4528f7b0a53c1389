package graft

import org.apache.spark.sql.functions._
import graft.ops.{Clustering, Similarity}

/** [[graft.ops.Clustering]] — the distributed spherical k-means trainer. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated direction clusters in 4-d: members are the axis
    * direction plus a small deterministic wobble in another coordinate.
    */
  private def clustered() = {
    val base = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val rows = for {
      c <- base.indices
      i <- 0 until 20
    } yield {
      val v = base(c).clone()
      v((c + 1) % 4) = 0.05f * (i % 5)
      ((c * 20 + i).toLong, v)
    }
    rows.toDF("id", "vec")
  }

  test("k-means recovers well-separated clusters; objective non-decreasing") {
    val m = Clustering.trainKMeans(clustered(), col("id"), col("vec"), k = 3, maxIter = 10)
    assert(m.centers.length == 3)
    assert(m.rounds >= 1 && m.rounds <= 10)
    // centers unit-norm
    m.centers.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    // spherical k-means objective (mean cosine to assigned center) is
    // non-decreasing across Lloyd's rounds
    m.objective.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-9, s"objective decreased: $a -> $b")
      case _         => ()
    }
    // converged: each trained center is dominated by one axis (the
    // clusters are separated by ~90 degrees, k-means cannot mix them)
    val domAxes = m.centers.map(c => c.indexOf(c.max)).toSet
    assert(domAxes.size == 3, s"centers collapsed: ${m.centers.map(_.mkString(",")).mkString(" | ")}")
    // final objective is high: every member is within ~14 degrees of its axis
    assert(m.objective.last > 0.97, s"objective too low: ${m.objective}")
  }

  test("assignTo groups members with their own cluster's center") {
    val df = clustered()
    val m = Clustering.trainKMeans(df, col("id"), col("vec"), k = 3, maxIter = 10)
    val assigned = df
      .select(col("id"), graft.functions.L2Normalize(col("vec")).as("unit"))
      .select(col("id"), Clustering.assignTo(col("unit"), m.centers).as("cid"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // all 20 members of a source cluster land in the same trained cluster
    val bySource = assigned.groupBy { case (id, _) => id / 20 }
    bySource.values.foreach { members =>
      assert(members.map(_._2).toSet.size == 1, s"cluster split: ${members.toSeq}")
    }
    // and the three source clusters map to three DISTINCT trained ids
    assert(bySource.values.map(_.head._2).toSet.size == 3)
  }

  test("trained centroids drop into ivfTopK and return verified hits") {
    val df = clustered()
    val m = Clustering.trainKMeans(df, col("id"), col("vec"), k = 3, maxIter = 10)
    val corpus = df.select(col("id"), col("vec"))
    val queries = df.filter(col("id") < 2).select(col("id").as("qid"), col("vec").as("qvec"))
    val hits = Similarity.ivfTopK(corpus, queries, Clustering.centroidsDf(spark, m), 3)
    val rows = hits.collect()
    assert(rows.nonEmpty)
    // every hit comes from the query's own source cluster (id / 20 equal):
    // the trained index routes queries to the cluster they belong to
    rows.foreach { r =>
      assert(r.getAs[Long]("id") / 20 == r.getAs[Long]("qid") / 20, r.toString)
    }
  }

  test("seeding and training are deterministic across invocations") {
    val a = Clustering.trainKMeans(clustered(), col("id"), col("vec"), k = 3, maxIter = 5)
    val b = Clustering.trainKMeans(clustered(), col("id"), col("vec"), k = 3, maxIter = 5)
    assert(a.centers.map(_.toSeq).toSeq == b.centers.map(_.toSeq).toSeq)
    assert(a.objective == b.objective)
  }

  test("k larger than distinct vectors degrades gracefully") {
    val tiny = Seq((1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
      .toDF("id", "vec")
    val m = Clustering.trainKMeans(tiny, col("id"), col("vec"), k = 5, maxIter = 3)
    assert(m.centers.length == 2) // capped at corpus size
  }

  /** Two tight blobs at (0,0) and (10,10) — separated by POSITION, not
    * direction (both sit on the same ray from the origin as their members
    * wobble), so Euclidean geometry must find them.
    */
  private def blobs() = {
    val rows = for {
      c <- 0 to 1
      i <- 0 until 20
    } yield {
      val base = c * 10.0f
      ((c * 20 + i).toLong,
        Array(base + 0.1f * (i % 5), base + 0.1f * ((i / 5) % 4)))
    }
    rows.toDF("id", "vec")
  }

  test("euclidean k-means: objective (mean sq distance) non-increasing, blobs recovered") {
    val m = Clustering.trainKMeans(blobs(), col("id"), col("vec"), k = 2,
      maxIter = 10, euclidean = true)
    assert(m.euclidean)
    m.objective.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"objective increased: $a -> $b")
      case _         => ()
    }
    // converged centers are the blob means: one near (0.2, 0.15), one near
    // (10.2, 10.15); mean squared distance within a blob is < 0.1
    assert(m.objective.last < 0.1, s"objective too high: ${m.objective}")
    val sorted = m.centers.sortBy(_.head)
    assert(math.abs(sorted(0)(0) - 0.2) < 0.05 && math.abs(sorted(1)(0) - 10.2) < 0.05,
      sorted.map(_.mkString(",")).mkString(" | "))
    // assignment splits the blobs exactly
    val assigned = blobs()
      .select(col("id"), Clustering.assignTo(col("vec").cast("array<double>"), m).as("cid"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(assigned.groupBy(_._1 / 20).values.forall(_.map(_._2).toSet.size == 1))
    assert(assigned.map(_._2).toSet.size == 2)
  }

  test("trainPqCodebooks: m per-slice codebooks in pqEncode's shape, entries unit-norm") {
    // every 2-dim slice non-zero (spherical per-slice training is
    // degenerate on zero subvectors, as for any cosine method)
    val df = (0 until 40).map { i =>
      (i.toLong, Array(1f + 0.1f * (i % 5), 0.3f + 0.05f * (i % 3),
        0.5f + 0.1f * (i % 4), 1f - 0.05f * (i % 6)))
    }.toDF("id", "vec")
    val cbs = Clustering.trainPqCodebooks(df, col("id"), col("vec"),
      m = 2, k = 2, dim = 4, maxIter = 3)
    assert(cbs.length == 2)
    cbs.foreach { cb =>
      assert(cb.nonEmpty && cb.forall(_.length == 2)) // sub = dim/m = 2
      cb.foreach { en =>
        assert(math.abs(math.sqrt(en.map(x => x.toDouble * x).sum) - 1.0) < 1e-6)
      }
    }
    // and they feed pqTopK end to end
    val corpus = df.select(col("id"), col("vec"))
    val queries = df.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    assert(Similarity.pqTopK(corpus, queries, cbs, 3).count() > 0)
  }

  test("NearestCenter is bit-identical to the unrolled DotProduct argmax twin") {
    // irregular centers + vectors exercising ties-by-order and both
    // geometries; the expression's left-to-right accumulation must make
    // (bucket, score) EXACTLY equal the literal-unrolled formulation it
    // replaced (same fold order), so trained models and assignments are
    // unchanged by the compile-stable rewrite
    val centers = Array(
      Array(0.6, 0.8, 0.0, 0.0),
      Array(0.0, 0.6, 0.8, 0.0),
      Array(0.0, 0.6, 0.8, 0.0), // duplicate: first-max tiebreak visible
      Array(-0.5, 0.5, 0.5, -0.5))
    val df = (0 until 97).map { i =>
      (i.toLong, Array.tabulate(4)(j =>
        (math.sin(i * 13 + j * 7) * 2.0).toFloat))
    }.toDF("id", "vec").select(col("id"), col("vec").cast("array<double>").as("x"))
    for (euclidean <- Seq(false, true)) {
      val nc = Clustering.nearest(col("x"), centers, euclidean)
      val scores =
        if (euclidean) Clustering.euclideanScores(col("x"), centers)
        else Clustering.simsToCenters(col("x"), centers)
      val twin = df.withColumn("sc", scores)
        .select(col("id"),
          (array_position(col("sc"), array_max(col("sc"))) - 1).cast("int").as("b0"),
          array_max(col("sc")).as("s0"))
      val got = df.select(col("id"),
          nc.getField("bucket").as("b"), nc.getField("score").as("s"))
        .join(twin, "id")
        .filter(col("b") =!= col("b0") || col("s") =!= col("s0"))
      assert(got.count() === 0, s"euclidean=$euclidean diverged")
    }
  }

  test("embeddingOutliers flags the far-from-centroid row, spares the tight cluster") {
    // 20 near-identical members around e1 plus one vector pointing at 45
    // degrees: the wobble cluster has tiny sigma, the diagonal's cosine
    // (~0.7) sits far below mean - 2*sigma
    val rows = (0 until 20).map { i =>
      (i.toLong, Array(1f, 0.01f * (i % 5), 0f, 0f))
    } :+ (99L, Array(1f, 1f, 0f, 0f))
    val df = rows.toDF("vec_id", "embedding")
    val m = Clustering.KMeansModel(
      Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 0.0)), Nil, 0)
    val out = Clustering.embeddingOutliers(df, col("vec_id"), col("embedding"), m)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(3))).toMap
    assert(out.size === 21)
    assert(out.forall(_._2._1 === 0))          // all assign to center 0
    assert(out(99L)._2 === 1)                  // the diagonal is the outlier
    assert(out.filter(_._1 != 99L).forall(_._2._2 === 0))
  }

  test("embeddingOutliers: singleton and zero-sigma clusters produce no outliers") {
    val df = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val m = Clustering.KMeansModel(
      Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 0.0)), Nil, 0)
    val out = Clustering.embeddingOutliers(df, col("vec_id"), col("embedding"), m)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out === Map(1L -> 0, 2L -> 0, 3L -> 0)) // sigma=0 -> thr=mean, none below
  }

  test("embeddingOutliers is deterministic across repartitionings") {
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(4)(j => (math.sin(i * 13 + j * 7) * 2.0).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Clustering.trainKMeans(df, col("vec_id"), col("embedding"), k = 4)
    val a = Clustering.embeddingOutliers(df, col("vec_id"), col("embedding"), m)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    val b = Clustering.embeddingOutliers(df.repartition(7), col("vec_id"), col("embedding"), m)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(a === b) // integer cluster stats: no partial-agg-order ulps
  }
}
