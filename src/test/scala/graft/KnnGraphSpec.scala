package graft

import graft.llm.SimSearch
import org.apache.spark.sql.functions._

/** [NORTH-STAR] All-vectors kNN graph ([[graft.llm.SimSearch.knnGraph]]),
  * the rows-only key `llm_knn_graph`: recall pinned against the exact
  * brute-force graph, every reported cosine independently recomputed,
  * and the output's structural contract (ranks, ordering, dedup)
  * asserted. */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.VectorFunctions.register(spark)

  private val K = 5

  private lazy val vecs: Map[Long, Array[Float]] =
    Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap

  private def cosE6(a: Array[Float], b: Array[Float]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    math.round(1e6 * dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Exact top-K neighbor set per vector (brute force, driver-side). */
  private lazy val exact: Map[Long, Seq[(Long, Long)]] =
    vecs.keys.toSeq.map { a =>
      a -> vecs.keys.toSeq.filter(_ != a)
        .map(b => (b, cosE6(vecs(a), vecs(b))))
        .sortBy { case (id, c) => (-c, id) }.take(K)
    }.toMap

  /** The declared geometry (llm_knn_graph): auto-sized planes (resolves
    * to the 8-plane floor at this corpus), LSH seed + 3 NN-descent
    * rounds with a 2k-wide candidate list. */
  private def run(rounds: Int): Map[Long, Seq[(Long, Long, Long)]] =
    SimSearch.knnGraph(Tables.embeddings(spark, sf), "vec_id",
        "embedding", k = K, planes = 0, probeHamming = 2,
        refineRounds = rounds)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq)
      .toMap

  private lazy val got: Map[Long, Seq[(Long, Long, Long)]] = run(3)

  private def recallOf(g: Map[Long, Seq[(Long, Long, Long)]]): Double =
    g.toSeq.map { case (src, rows) =>
      val want = exact(src).map(_._1).toSet
      rows.map(_._2).count(want)
    }.sum.toDouble / (vecs.size * K)

  test("kNN graph: structural contract (ranks, order, dedup, degree)") {
    assert(got.nonEmpty)
    for ((src, rows) <- got) {
      assert(rows.map(_._1) == (1L to rows.length), s"ranks of $src")
      assert(rows.length <= K)
      val byRank = rows.map(r => (r._3, r._2)) // (cos, nbr) in rank order
      assert(byRank == byRank.sortBy { case (c, id) => (-c, id) },
        s"order of $src")
      assert(rows.map(_._2).distinct.length == rows.length,
        s"duplicate neighbor for $src")
      assert(!rows.map(_._2).contains(src), s"self-loop at $src")
    }
  }

  test("kNN graph: every reported cosine is exact") {
    for ((src, rows) <- got; (_, nbr, c) <- rows)
      assert(c === cosE6(vecs(src), vecs(nbr)), s"cosine ($src, $nbr)")
  }

  test("kNN graph: recall vs the brute-force graph, descent must add") {
    val seedOnly = recallOf(run(0))
    val recall = recallOf(got)
    info(f"knn-graph recall@$K: LSH seed $seedOnly%.3f -> +3 descent rounds $recall%.3f")
    // measured 0.94 refined at 8 planes / hamming 2 with the log-n
    // descent width (autoSearchK, round 15 — the fixed 2k width
    // decayed 0.80 -> 0.59 from 500 -> 2,000 vectors and is gone);
    // 0.97 at sf0.1's 2,000 vectors, re-measured engine-outside every
    // round by tools/knn_recall.py (floor 0.70 there, sampled). Floor
    // set under the measurement so data regeneration noise cannot
    // flake the suite. Brute force stays the exact path
    // (llm_simsearch_topk); this is the graph-at-scale trade, and the
    // descent rounds must be doing real work.
    assert(recall >= 0.80, f"recall $recall%.3f below floor")
    assert(recall > seedOnly, "NN-descent rounds added no recall")
  }

  test("clone collapse: planted clones expand with mates at cos 1e6") {
    val base = Tables.embeddings(spark, sf)
    val clones = base.filter($"vec_id" < 20)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding", $"label")
    val g = SimSearch.knnGraph(base.unionByName(clones), "vec_id",
        "embedding", k = K, planes = 0, probeHamming = 2,
        refineRounds = 3)
      .as[(Long, Long, Long, Long)].collect()
    val bySrc = g.groupBy(_._1)
    // every vector (clones included) has a list
    assert(bySrc.size === vecs.size + 20)
    for (i <- 0L until 20L) {
      assert(bySrc(i).exists(r => r._3 == i + 100000 && r._4 == 1000000L),
        s"mate of $i missing")
      assert(bySrc(i + 100000).exists(r => r._3 == i && r._4 == 1000000L),
        s"mate of clone of $i missing")
    }
    // the clone-free majority is undisturbed by the collapse path:
    // where no planted id entered a list, it must match the plain run
    val unaffected = bySrc.collect {
      case (src, rows) if src >= 20 && src < 100000 &&
          rows.forall(_._3 < 100000) =>
        src -> rows.map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq
    }
    val agree = unaffected.count { case (src, rows) => got(src) == rows }
    assert(agree >= unaffected.size * 9 / 10,
      s"collapse path disturbed clone-free lists: $agree/${unaffected.size}")
  }

  test("graph clusters: planted clones co-cluster; sizes consistent") {
    import graft.llm.Cluster
    val base = Tables.embeddings(spark, sf)
    val clones = base.filter($"vec_id" < 20)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding", $"label")
    val g = SimSearch.knnGraph(base.unionByName(clones), "vec_id",
        "embedding", k = K, planes = 0, probeHamming = 2,
        refineRounds = 3)
    val edges = g.filter($"cos_e6" >= 950000L)
      .select($"src_id".as("id_a"), $"nbr_id".as("id_b"))
    val cc = Cluster.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    // every clone pair must land in one component (their mutual edge is
    // cos = 1e6, always over threshold)
    for (i <- 0L until 20L)
      assert(cc(i) == cc(i + 100000), s"clone pair $i split across clusters")
    // the component label is the min member id, so no planted clone id
    // can ever BE a label of a base vector's cluster
    assert(cc.filter(_._1 < 100000).values.forall(_ < 100000),
      "a base vector took a clone id as its cluster label")
  }

  test("declared llm_knn_graph_clusters: planted-corpus output is " +
      "exactly the clone pairs (the DuckDB-oracle contract)") {
    // round-8 non-vacuity fix: the declared query stages one exact
    // clone per 10th vector (id + 1e12), so at EVERY driver SF its
    // output is 2 rows per seed — {v, v+1e12} labeled v, size 2 — and
    // nothing else (no natural testdata pair crosses cos 0.95; max
    // measured 0.60). This replays the oracle's closed form in-process.
    val out = graft.llm.LlmQueries.queries("llm_knn_graph_clusters")(
      spark, sf).as[(Long, Long, Long)].collect()
    val seeds = Tables.embeddings(spark, sf)
      .filter($"vec_id" % 10 === 0).select($"vec_id")
      .as[Long].collect().sorted
    val expected = seeds.flatMap(v =>
      Seq((v, v, 2L), (v + 1000000000000L, v, 2L))).sortBy(_._1)
    assert(out.toSeq == expected.toSeq,
      s"clusters diverged from the planted-clone closed form " +
        s"(got ${out.length} rows, expected ${expected.length})")
  }

  test("planted-corpus staging de-clones byte-identical natural " +
      "vectors (the key-shifted scale-corpus shape, round 9)") {
    // The r8 sf1 sweep silently benched a contract violation: key-shifted
    // probe corpora carry N byte-identical copies of every vector, which
    // co-cluster with the planted pairs. The staging now collapses each
    // distinct embedding to its min-id representative first; pin that ON
    // a clone-carrying corpus (the driver testdata is clone-free, so the
    // declared-key test above only exercises the no-op path).
    val dir = tmpDir("graft-knng-clonecorpus")
    val base = Tables.embeddings(spark, sf)
      .orderBy("vec_id").limit(60)
    // natural clones: a byte-identical copy of every 7th vector under a
    // DIFFERENT natural id (id + 5000 — same embedding, higher id, so the
    // min-id rule must keep the original and drop the copy)
    base.unionByName(
        base.filter($"vec_id" % 7 === 0)
          .withColumn("vec_id", $"vec_id" + 5000L))
      .write.parquet(s"$dir/embeddings.parquet")
    val out = graft.llm.LlmQueries.queries("llm_knn_graph_clusters")(
      spark, dir).as[(Long, Long, Long)].collect()
    // closed form over the min-id representatives: the 60 base ids
    // survive the de-clone (every +5000 copy drops), seeds are the
    // surviving ids % 10 == 0, and each seed clusters exactly with its
    // planted 1e12 clone — the natural clones must contribute NOTHING
    val repSeeds = base.select($"vec_id").as[Long].collect()
      .filter(_ % 10 == 0).sorted
    val expected = repSeeds.flatMap(v =>
      Seq((v, v, 2L), (v + 1000000000000L, v, 2L))).sortBy(_._1)
    assert(out.toSeq == expected.toSeq,
      s"clone-carrying corpus broke the closed form (got ${out.length} " +
        s"rows, expected ${expected.length})")
  }
}
