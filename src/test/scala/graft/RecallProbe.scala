package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round-15): recall@5 of [[graft.llm.SimSearch.knnGraph]]
  * at sf0.1 (2000 vectors) across (refineRounds, searchK) — the grid
  * behind the corpus-size-stable geometry choice. Not part of any gate;
  * run with `sbt "Test/runMain graft.RecallProbe <sfDir> [grid...]"`. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
}
