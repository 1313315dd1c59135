package graft

import org.apache.spark.sql.functions._
import graft.llm.Ivf

/** IVF k-means: deterministic assignment contract and Lloyd training
  * recovering planted clusters. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated planted clusters along different axes, 30
    * vectors each, ids interleaved so first-k init starts one centroid
    * in each cluster's basin is NOT guaranteed (ids 0,1,2 = one per
    * cluster by construction below). */
  private def planted = {
    val base = Map(0 -> Array(1f, 0f, 0f, 0f), 1 -> Array(0f, 1f, 0f, 0f),
      2 -> Array(0f, 0f, 1f, 0f))
    (0L until 90L).map { id =>
      val c = (id % 3).toInt
      // small deterministic perturbation keeps members near their axis
      val eps = 0.05f * ((id / 3 % 7).toInt - 3)
      val v = base(c).clone()
      v(3) = eps
      (id, v.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("assign: every vector lands on its planted axis centroid") {
    val centroids = planted.filter(col("vec_id") < 3)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val got = Ivf.assign(planted, "vec_id", "embedding", centroids)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect()
    assert(got.length == 90)
    got.foreach { case (id, cid) => assert(cid == id % 3, s"vec $id → $cid") }
  }

  test("assign ties resolve to the smallest centroid id") {
    val emb = Seq((10L, Seq(1f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val cents = Seq((7L, Seq(1f, 0f, 0f, 0f)), (3L, Seq(0f, 1f, 0f, 0f)))
      .toDF("centroid_id", "cvec")
      .select(col("centroid_id"), col("cvec").cast("array<float>").as("cvec"))
    val got = Ivf.assign(emb, "vec_id", "embedding", cents)
      .select("centroid_id").as[Long].head()
    assert(got == 3L)
  }

  test("lloyd training recovers the planted partition") {
    // init = first 3 ids, one per planted cluster; 3 rounds settle means
    val trained = Ivf.lloyd(planted, "vec_id", "embedding", k = 3, iters = 3)
    assert(trained.count() == 3)
    val got = Ivf.assign(planted, "vec_id", "embedding", trained)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect()
    // members of one planted cluster must share one trained centroid
    val byPlanted = got.groupBy(_._1 % 3).view.mapValues(_.map(_._2).toSet)
    byPlanted.foreach { case (c, cids) =>
      assert(cids.size == 1, s"planted cluster $c split across $cids") }
    assert(byPlanted.values.flatten.toSet.size == 3, "clusters collapsed")
  }

  test("lloyd seeds k centroids even when ids are sparse (sampled input)") {
    // ids shifted far from 0 — an `id < k` init would seed zero centroids
    val sparse = planted.withColumn("vec_id", col("vec_id") + 1000000L)
    val trained = Ivf.lloyd(sparse, "vec_id", "embedding", k = 3, iters = 1)
    assert(trained.count() == 3)
    assertThrows[IllegalArgumentException] {
      Ivf.lloyd(sparse.limit(2), "vec_id", "embedding", k = 3, iters = 0)
    }
  }

  test("empty cells keep their previous centroid through a Lloyd step") {
    // a far-away centroid no vector chooses must survive the step
    val cents = planted.filter(col("vec_id") < 3)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
      .unionByName(Seq((99L, Seq(-1f, -1f, -1f, -1f))).toDF("centroid_id", "cvec")
        .select(col("centroid_id"), col("cvec").cast("array<float>").as("cvec")))
    val stepped = Ivf.lloydStep(planted, "vec_id", "embedding", cents)
    assert(stepped.filter(col("centroid_id") === 99L).count() == 1)
  }
}
