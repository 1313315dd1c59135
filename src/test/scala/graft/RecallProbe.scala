package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall measurement harness for [[graft.llm.SimSearch.knnGraph]]
  * (round-15, behind the corpus-size-stable geometry choice).
  *
  * Two modes:
  *  - `sbt "Test/runMain graft.RecallProbe <sfDir> [r:searchK ...]"` —
  *    driver-side exact recall@5 at the declared (or a grid of)
  *    geometry; sized for the <=2k-vector SFs.
  *  - `sbt "Test/runMain graft.RecallProbe <sfDir> --export <root>"` —
  *    build the graph at the DECLARED geometry and write the
  *    `knng_edges_v3_<corpusTag>` export (the graft.Verify side-effect
  *    format) under `<root>`, for `tools/knn_recall.py <sfDir> <root>`
  *    to score with its sampled DuckDB-exact ground truth — the
  *    >=20k-vector path (the perturbed-clone sf1 corpus, round-14
  *    verdict ask #2, where a full Verify run just for the export
  *    would cost 25 min). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    if (args.length >= 3 && args(1) == "--export") {
      exportEdges(sfDir, args(2)); return
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)

    val emb = Tables.embeddings(spark, sfDir)
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val n = vecs.size
    def cosE6(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.round(1e6 * dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    val K = 5
    println(s"corpus: $n vectors; computing exact graph...")
    val ids = vecs.keys.toArray.sorted
    val exact: Map[Long, Set[Long]] =
      java.util.Arrays.stream(ids).parallel().boxed()
        .map[(Long, Set[Long])] { a =>
          a.toLong -> ids.iterator.filter(_ != a)
            .map(b => (b, cosE6(vecs(a), vecs(b))))
            .toSeq.sortBy { case (id, c) => (-c, id) }.take(K)
            .map(_._1).toSet
        }
        .collect(java.util.stream.Collectors.toList[(Long, Set[Long])])
        .toArray.map(_.asInstanceOf[(Long, Set[Long])]).toMap

    def recall(rounds: Int, searchK: Int, planes: Int = 0,
               hamming: Int = 2): Double = {
      val t0 = System.nanoTime()
      val g = graft.llm.SimSearch.knnGraph(emb, "vec_id", "embedding",
          k = K, planes = planes, probeHamming = hamming,
          refineRounds = rounds, searchK0 = searchK)
        .select("src_id", "nbr_id").as[(Long, Long)].collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val bySrc = g.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val r = ids.map(a => (bySrc.getOrElse(a, Set.empty) & exact(a)).size)
        .sum.toDouble / (n * K)
      println(f"rounds=$rounds searchK=$searchK planes=$planes h=$hamming" +
        f" -> recall@$K = $r%.4f  (${secs}%.1f s)")
      r
    }

    if (args.length > 1) args.drop(1).foreach { spec =>
      val Array(r, sk) = spec.split(":").map(_.toInt)
      recall(r, sk)
    } else
      recall(3, 0) // searchK=0 -> autoSearchK, the declared geometry
    spark.stop()
  }

  /** Build at the declared llm_knn_graph geometry (k=5, auto planes,
    * hamming 2, 3 rounds, auto searchK) and export edges in the
    * verify-time format tools/knn_recall.py reads. */
  private def exportEdges(sfDir: String, exportRoot: String): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("graft-recall-export")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
    // The 16 shuffle partitions above are deliberately NOT corpus-
    // sized: knnGraph guards its own descent candidate exchange
    // (descParts, SimSearch) — this harness runs the big corpora at
    // the default-shaped session exactly so that guard is what's
    // being exercised (it OOM'd here at 100k vectors without it).
    val tag = emb.count() * 1000000000L +
      spark.read.parquet(s"$sfDir/orders.parquet").count()
    val t0 = System.nanoTime()
    val g = graft.llm.SimSearch.knnGraph(emb, "vec_id", "embedding",
      k = 5, planes = 0, probeHamming = 2, refineRounds = 3)
    g.select(col("src_id").as("src"), col("nbr_id").as("dst"),
        col("rank"), col("cos_e6"), lit(tag).as("corpus_tag"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$exportRoot/knng_edges_v3_$tag")
    println(f"exported knng_edges_v3_$tag under $exportRoot " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    spark.stop()
  }
}
