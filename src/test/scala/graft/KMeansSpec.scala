package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.KMeans

class KMeansSpec extends SparkSpec {

  private val dim = 4

  /** Three well-separated blobs around (±10, 0) and (0, 10) in the first
    * two dims, 20 points each, deterministic offsets.
    */
  private def blobs() = {
    val centers = Seq(Array(10f, 0f, 0f, 0f), Array(-10f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f))
    val rows = for {
      (c, b) <- centers.zipWithIndex
      i <- 0 until 20
    } yield Row((b * 20 + i).toLong,
      c.zipWithIndex.map { case (v, d) => v + ((i * 7 + d * 3) % 5 - 2) * 0.1f })
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  test("kmeans separates well-separated blobs into pure clusters") {
    val asg = KMeans.assign(blobs(), "vec_id", "embedding", dim, k = 3, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg.size == 60)
    // every blob's 20 members share one label, and the three labels differ
    val labels = (0 until 3).map { b =>
      val ls = (0 until 20).map(i => asg((b * 20 + i).toLong)).distinct
      assert(ls.size == 1, s"blob $b split across clusters $ls")
      ls.head
    }
    assert(labels.distinct.size == 3)
  }

  test("kmeans assignment is deterministic across runs") {
    val df = blobs()
    val a = KMeans.assign(df, "vec_id", "embedding", dim, 3, 2).collect().toSeq
    val b = KMeans.assign(df, "vec_id", "embedding", dim, 3, 2).collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }

  test("kmeans survives emptied clusters (k > natural clusters)") {
    // k=10 over 3 blobs: some clusters lose all members after iteration 1;
    // the op must still assign every row to a surviving centroid
    val asg = KMeans.assign(blobs(), "vec_id", "embedding", dim, k = 10, iters = 3)
    assert(asg.count() == 60)
    assert(asg.filter(col("cluster") < 0).count() == 0)
  }

  test("joint PQ codebook training equals m independent per-subspace k-means runs") {
    // trainSubspaceBooks packs all m trainings into one aggregation per
    // iteration — the codebooks must be BIT-identical to running
    // assignWithCentroids on each subvector slice separately (the form the
    // DuckDB oracle replays)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (m, ksub, iters, d, dsub) = (8, 16, 2, 64, 8)
    val joint = KMeans.trainSubspaceBooks(emb, "vec_id", "embedding", d, m, ksub, iters)
    for (j <- 0 until m) {
      val sub = emb.select(col("vec_id").as("vid"),
        slice(col("embedding"), j * dsub + 1, dsub).as("sub"))
      val indep = KMeans.assignWithCentroids(sub, "vid", "sub", dsub, ksub, iters)._2
      assert(joint(j).map(_._1) == indep.map(_._1), s"subspace $j cluster ids")
      joint(j).zip(indep).foreach { case ((_, a), (_, b)) =>
        assert(a.toSeq == b.toSeq, s"subspace $j centroid values")
      }
    }
  }

  test("semanticDedup keeps the lowest id of each near-dup set and all singletons") {
    // two identical vectors (1,2) plus one distant vector — drop id 2 only
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(1L, Array(1f, 0f, 0f, 0f)),
      Row(2L, Array(1f, 0f, 0f, 0f)),
      Row(3L, Array(0f, 5f, 0f, 0f)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val kept = KMeans.semanticDedup(df, "vec_id", "embedding", dim,
      k = 2, iters = 2, threshold = 0.9).collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  // --- NearestClusterConst: the single-loop argmin the assignment rides on ---

  private val ncSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("q", ArrayType(LongType))))

  private def ncDf(rows: Seq[Row]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 2), ncSchema)

  private def nearest(rows: Seq[Row], ids: Array[Long],
      cents: Array[Array[Double]]): Map[Long, Long] =
    ncDf(rows).select(col("id"),
        graft.plans.NearestClusterConst(col("q"), ids, cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("NearestClusterConst: argmin, tie→lowest id, short/null→lowest id") {
    val ids = Array(3L, 7L, 9L)
    val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(5.0, 5.0))
    val rows = Seq(
      Row(1L, Seq(9L, 1L)),          // nearest (10,0) → 7
      Row(2L, Seq(5L, 0L)),          // equidistant to (0,0) and (10,0) → tie → 3
      Row(3L, Seq(1L)),              // shorter than every centroid → lowest id 3
      Row(4L, null),                 // null vector → lowest id 3
      Row(5L, Seq(4L, 6L, 99L)))     // longer is fine; nearest (5,5) → 9
    val got = nearest(rows, ids, cents)
    assert(got == Map(1L -> 7L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 9L))
    // interpreted eval path agrees with the codegen path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(nearest(rows, ids, cents) == got)
    finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("NearestClusterConst: vector shorter than SOME centroids skips only those") {
    // centroid 1 is 3-dim: a 2-dim vector has a NULL distance to it and must
    // be assigned among the 2-dim centroids even when centroid 1 would be
    // closer if padded
    val ids = Array(1L, 2L)
    val cents = Array(Array(9.0, 9.0, 9.0), Array(0.0, 0.0))
    val got = nearest(Seq(Row(1L, Seq(9L, 9L))), ids, cents)
    assert(got == Map(1L -> 2L))
  }
}
