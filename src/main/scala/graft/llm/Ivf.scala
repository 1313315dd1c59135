package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** [NORTH-STAR] IVF centroid training and assignment — the learned
  * counterpart of the hyperplane-LSH layout in [[SimSearch]]: k-means
  * centroids adapt the partitioning to the data's actual density, so an
  * IVF index probes fewer, better-matched cells than data-oblivious
  * hyperplanes at the same recall.
  *
  * Scale shape (100 TB): `assign` is corpus × broadcast(centroids) — a
  * BroadcastNestedLoopJoin over k rows (k = #cells, thousands at most;
  * never a shuffle of the corpus) followed by a groupBy(id) argmax that
  * Catalyst satisfies with partial aggregation. One Lloyd step adds a
  * (cell, dim)-keyed mean — cardinality k × dims, tiny — so the whole
  * iteration shuffles only centroid-sized data; the corpus is scanned,
  * never exchanged. In practice IVF trains on a sample (`Curate.
  * sampleDeterministic`) and assigns the full corpus once.
  *
  * Determinism: assignment is integer cosine (cosineE6) with ties to the
  * smallest centroid id — fully deterministic, which is why the declared
  * `llm_ivf_assign` query carries a DuckDB oracle. Lloyd RETRAINING uses
  * float `avg` whose summation order is partition-dependent; that makes
  * trained centroids bit-nondeterministic across cluster layouts (like
  * every distributed k-means), so training is spec-verified by cluster
  * RECOVERY on planted data, not by an oracle hash.
  */
object Ivf {

  /** Assign every vector to its best centroid by cosine: argmax cos_e6,
    * ties to the smallest centroid id. `centroids(cidCol, cvecCol)` must
    * be broadcast-small. Returns (idCol, centroid_id, cos_e6). */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, cidCol: String = "centroid_id",
             cvecCol: String = "cvec"): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    emb.crossJoin(broadcast(centroids))
      .select(col(idCol), col(cidCol),
        SimSearch.cosineE6(col(vecCol), col(cvecCol)).as("cos_e6"))
      .groupBy(col(idCol))
      .agg(max(struct(col("cos_e6"),
        (lit(0L) - col(cidCol)).as("neg_cid"))).as("best"))
      .select(col(idCol),
        (lit(0L) - col("best.neg_cid")).as("centroid_id"),
        col("best.cos_e6").as("cos_e6"))
  }

  /** One Lloyd step: assign, then recompute each centroid as the
    * element-wise mean of its members. The mean is a (centroid, dim)
    * aggregate — posexplode multiplies rows by dims (64), but the
    * groupBy output is k × dims rows regardless of corpus size. Empty
    * cells keep their previous centroid (standard k-means practice;
    * dropping them would shrink k mid-train). */
  def lloydStep(emb: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame): DataFrame = {
    val members = assign(emb, idCol, vecCol, centroids)
      .select(col(idCol), col("centroid_id"))
      .join(emb, idCol)
    val means = members
      .select(col("centroid_id"), posexplode(col(vecCol)))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("centroid_id"))
      .agg(collect_list(struct(col("pos"), col("m"))).as("dims"))
      .select(col("centroid_id"),
        transform(array_sort(col("dims")), x =>
          x.getField("m").cast("float")).as("cvec"))
    centroids.join(means, Seq("centroid_id"), "left_anti")
      .unionByName(means)
  }

  /** k-means training: smallest-k-ids init (deterministic for ANY id
    * space — a TakeOrdered, not an `id < k` filter, so hash-sampled
    * inputs with sparse ids still seed k centroids), `iters` Lloyd
    * steps, lineage cut per step. Returns (centroid_id, cvec). */
  def lloyd(emb: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0)
    var centroids = emb
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cvec"))
      .orderBy("centroid_id").limit(k)
      .localCheckpoint()
    require(centroids.count() == k,
      s"need at least $k vectors to seed $k centroids")
    for (_ <- 0 until iters)
      centroids = lloydStep(emb, idCol, vecCol, centroids).localCheckpoint()
    centroids
  }
}
