package graft

import org.apache.spark.sql.functions._
import graft.llm.LlmQueries
import graft.ops.RelationalOps

/** Independent re-implementations of the round-7 third-wave operators
  * (corpus-health metrics, contrastive mining, mode, ε-band join) —
  * naive Scala recomputations the declared queries must match, plus the
  * structural pins for the rows-only graph-served contrastive variant.
  * The DuckDB oracles cover the cross-engine hash; these cover the
  * SEMANTICS against a second, unrelated implementation. */
class Wave7Spec extends SparkSpec {

  private def cosE6(a: Array[Float], b: Array[Float]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    math.round(1000000.0 * dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  private def lehmer(id: Long): Long = {
    val m = 2147483647L
    (id % m) * 48271 % m * 48271 % m
  }

  private lazy val vecs: Map[Long, (Int, Array[Float])] =
    Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getSeq[Float](1).toArray))
      .toMap

  test("contrastive pairs: positives are the exact same-label argmax") {
    val got = LlmQueries.queries("llm_contrastive_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // naive: per anchor, best same-label candidate by (cos desc, id asc)
    val want = vecs.toSeq.flatMap { case (aid, (lab, av)) =>
      val cands = vecs.toSeq.collect {
        case (cid, (l2, cv)) if cid != aid && l2 == lab =>
          (cid, cosE6(av, cv))
      }
      if (cands.isEmpty) None
      else Some {
        val (pid, pc) = cands.minBy { case (cid, c) => (-c, cid) }
        (aid, pid, pc)
      }
    }.sortBy(_._1)
    assert(got.toSeq == want, "exact supervised positives must match naive")
  }

  test("contrastive pairs: the negative ring is the Lehmer successor") {
    val got = LlmQueries.queries("llm_contrastive_pairs")(spark, sf)
      .select("anchor_id", "neg_id", "neg_cos_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ring = vecs.keys.toSeq.sortBy(id => (lehmer(id), id))
    val succ = ring.zip(ring.drop(1) :+ ring.head).toMap
    got.foreach { case (aid, nid, nc) =>
      assert(succ(aid) == nid, s"anchor $aid: ring successor mismatch")
      assert(cosE6(vecs(aid)._2, vecs(nid)._2) == nc,
        s"anchor $aid: negative cosine must be exact")
    }
    // the ring visits every vector exactly once (bijection)
    assert(succ.values.toSet.size == ring.size)
  }

  test("contrastive graph variant: rank-1 edges, exact neg, recall floor") {
    val g = LlmQueries.queries("llm_contrastive_pairs_graph")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val byAnchor = g.groupBy(_._1)
    assert(byAnchor.values.forall(_.length == 1),
      "one (pos, neg) row per anchor")
    // every reported positive cosine is the true cosine of that edge,
    // and the negative is the same ring as the exact form
    val ring = vecs.keys.toSeq.sortBy(id => (lehmer(id), id))
    val succ = ring.zip(ring.drop(1) :+ ring.head).toMap
    g.foreach { case (aid, pid, pc, nid, nc) =>
      assert(cosE6(vecs(aid)._2, vecs(pid)._2) == pc)
      assert(succ(aid) == nid && cosE6(vecs(aid)._2, vecs(nid)._2) == nc)
    }
    // recall floor vs the exact UNRESTRICTED top-1 (the graph ignores
    // labels): the NN-descent graph's rank-1 edge should be the true
    // nearest neighbor for a healthy share of anchors
    val exactTop1 = vecs.map { case (aid, (_, av)) =>
      aid -> vecs.toSeq.collect { case (cid, (_, cv)) if cid != aid =>
        (cid, cosE6(av, cv))
      }.minBy { case (cid, c) => (-c, cid) }._1
    }
    val hit = g.count { case (aid, pid, _, _, _) => exactTop1(aid) == pid }
    val recall = hit.toDouble / g.length
    info(f"graph contrastive rank-1 recall vs exact: $recall%.2f")
    assert(recall >= 0.4, s"rank-1 recall $recall below floor")
  }

  test("token zipf: slope matches an independent least-squares fit") {
    val got = LlmQueries.queries("llm_token_zipf")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // naive: re-tokenize, count, rank, quantize, fit — all in Scala
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val freq = docs.groupBy(_._1).map { case (src, rows) =>
      val grams = rows.flatMap { case (_, t) =>
        val toks = t.split(" ", -1)
        if (toks.length < 2) Seq(toks.mkString(" "))
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      }
      src -> grams.groupBy(identity).map { case (g, o) => (g, o.size.toLong) }
    }
    val want = freq.map { case (src, counts) =>
      val ranked = counts.toSeq.sortBy { case (g, f) => (-f, g) }.zipWithIndex
      val pts = ranked.map { case ((_, f), i) =>
        (math.round(1e6 * math.log(i + 1.0)), math.round(1e6 * math.log(f.toDouble)))
      }
      val n = pts.size.toDouble
      val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
      val sxy = pts.map(p => p._1 * p._2).sum.toDouble
      val sxx = pts.map(p => p._1 * p._1).sum.toDouble
      (src, pts.size.toLong,
        math.round(1e6 * (n * sxy - sx * sy) / (n * sxx - sx * sx)))
    }.toSeq.sortBy(_._1)
    got.zip(want).foreach { case ((gs, gn, gsl), (ws, wn, wsl)) =>
      assert(gs == ws && gn == wn, s"$gs: type count mismatch")
      assert(math.abs(gsl - wsl) <= 1, s"$gs: slope $gsl vs naive $wsl")
    }
    // corpus health: natural-ish text must fit a falling power law
    assert(got.forall(_._3 < 0), "zipf slope must be negative")
  }

  test("ngram diversity: matches naive type/token ratio") {
    val got = LlmQueries.queries("llm_diversity_ngram")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val grams = rows.flatMap { case (_, t) =>
        val toks = t.split(" ", -1)
        if (toks.length < 2) Seq(toks.mkString(" "))
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      }
      (src, grams.size.toLong, grams.distinct.size.toLong,
        math.round(10000.0 * grams.distinct.size / grams.size))
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("agg_mode: deterministic argmax with ties to the smallest type") {
    val got = RelationalOps.queries("agg_mode")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ev = Tables.events(spark, sf).select("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val counts = rows.groupBy(_._2).map { case (t, o) => (t, o.size.toLong) }
      val (mt, mn) = counts.toSeq.minBy { case (t, n) => (-n, t) }
      (u, mt, mn, rows.size.toLong)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("curriculum order: banded quality-first, shuffled within band") {
    val got = LlmQueries.queries("llm_curriculum_order")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // the position order must list deciles ascending (easiest-first
    // epochs), and within a decile follow the Lehmer shuffle
    val byPos = got.sortBy(_._3)
    assert(byPos.map(_._2).sliding(2).forall(p => p(0) <= p(1)),
      "curriculum positions must be decile-monotone")
    byPos.groupBy(_._2).values.foreach { band =>
      val ids = band.sortBy(_._3).map(_._1)
      val expect = ids.sortBy(id => (lehmer(id), id))
      assert(ids.sameElements(expect),
        "within-band order must be the Lehmer shuffle")
    }
    // positions are a permutation of 1..n
    assert(byPos.map(_._3).toSeq == (1L to got.length).toSeq)
  }

  test("batch buckets: fixed batches, correct pad targets, no mixing") {
    val got = LlmQueries.queries("llm_batch_buckets")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    got.foreach { case (_, n, bucket, _, slot, padTo, waste) =>
      assert(bucket == n / 64, "bucket must be the 64-token bin")
      assert(slot >= 0 && slot < 16)
      assert(padTo >= n && waste == padTo - n)
      assert(padTo / 64 == bucket,
        "pad target stays inside the bucket's length bin")
    }
    got.groupBy(t => (t._3, t._4)).foreach { case ((_, _), batch) =>
      assert(batch.length <= 16, "batch size bounded")
      assert(batch.map(_._5).distinct.length == batch.length,
        "slots unique within a batch")
      assert(batch.map(_._6).distinct.length == 1 &&
        batch.map(_._6).head == batch.map(_._2).max,
        "pad target is the batch max")
    }
    // only the LAST batch of a bucket may be short
    got.groupBy(_._3).foreach { case (_, rows) =>
      val sizes = rows.groupBy(_._4).toSeq.sortBy(_._1)
        .map { case (_, b) => b.length }
      assert(sizes.dropRight(1).forall(_ == 16),
        "every non-final batch is full")
    }
  }

  private lazy val evRows: Array[(Long, String, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("window_funnel: greedy stage mins equal a per-user replay") {
    val got = RelationalOps.queries("window_funnel")(spark, sf)
      .collect().map { r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))
      }.toSeq
    val win = 6L * 3600 * 1000
    val want = evRows.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val byType = rows.groupBy(_._2)
      byType.get("view").map(_.map(_._3).min).map { t1 =>
        val t2 = byType.getOrElse("click", Array.empty[(Long, String, Long)])
          .map(_._3).filter(t => t > t1 && t <= t1 + win)
          .sorted.headOption
        val t3 = t2.flatMap { m2 =>
          byType.getOrElse("purchase", Array.empty[(Long, String, Long)])
            .map(_._3).filter(t => t > m2 && t <= t1 + win)
            .sorted.headOption
        }
        (u, t1, t2, t3, 1L + t2.size + t3.size)
      }
    }.sortBy(_._1)
    assert(got == want, "funnel must equal the naive per-user replay")
  }

  test("agg_retention_cohorts: triangle equals the naive cohort count") {
    val got = RelationalOps.queries("agg_retention_cohorts")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val active = evRows.map { case (u, _, ts) => (u, ts / 86400000L) }.distinct
    val cohort = active.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val want = active.groupBy { case (u, day) => (cohort(u), day - cohort(u)) }
      .map { case ((c, off), rows) => (c, off, rows.map(_._1).distinct.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got == want)
  }

  test("ad-hoc SQL shapes plan as claimed: broadcasts + TakeOrdered") {
    val q3 = RelationalOps.queries("sql_segment_topn")(spark, sf)
      .queryExecution.executedPlan
    val q3n = planNodes(q3).map(_.getClass.getSimpleName)
    assert(q3n.exists(_.startsWith("TakeOrderedAndProject")),
      s"top-10 must be TakeOrderedAndProject, got: $q3n")
    assert(q3n.exists(_.startsWith("BroadcastHashJoin")),
      "the segment-filtered customer side must broadcast")
    assert(!q3n.exists(_.startsWith("CartesianProduct")))
    val q5n = planNodes(
      RelationalOps.queries("sql_region_revenue")(spark, sf)
        .queryExecution.executedPlan).map(_.getClass.getSimpleName)
    assert(q5n.count(_.startsWith("BroadcastHashJoin")) >= 2,
      s"region/nation dims must broadcast, got: $q5n")
    assert(!q5n.exists(_.startsWith("CartesianProduct")))
  }

  test("graph pagerank: exact replay of the integer power iteration") {
    val got = LlmQueries.queries("llm_graph_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // replay from the SAME persisted graph edges with plain Scala longs
    val edges = LlmQueries.queries("llm_knn_graph")(spark, sf)
      .select("src_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.length }
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = verts.length
    val init = 1000000000000L / n
    val teleport = 15L * init / 100L
    var pr = verts.map(_ -> init).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = verts.map(v =>
        v -> (teleport + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    assert(got == pr, "pagerank must replay exactly")
    // centrality sanity: mass is conserved up to the floor-division
    // shedding, and at least one vertex rises above the uniform score
    assert(got.values.sum <= init * n && got.values.max > init / 2)
    assert(got.values.exists(_ != got.values.head) || n == 1)
  }

  test("join_band_value: bucketed candidates equal the naive band join") {
    val got = RelationalOps.queries("join_band_value")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val ev = Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val want = ev.filter(_._1 % 20 == 0).map { case (id, t, v) =>
      id -> ev.count { case (id2, t2, v2) =>
        id2 != id && t2 == t && math.abs(v2 - v) <= 0.25
      }.toLong
    }.toMap
    assert(got == want, "ε-band counts must equal the all-pairs truth")
  }
}
