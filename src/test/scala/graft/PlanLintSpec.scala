package graft

import org.apache.spark.sql.SparkSession

/** Plan lint over the ENTIRE declared-query registry: every query must
  * analyze + optimize cleanly at plan time, and none may plan a
  * CartesianProduct — the one silent scale-killer a green small-SF
  * correctness row would never catch (the declared J6 generator over
  * region×nation is the only sanctioned cross join, and even it must
  * come out as a broadcast NLJ, never a shuffled cartesian). */
class PlanLintSpec extends SparkSpec {

  // Skipped entirely: queries with real filesystem/state side effects
  // at CONSTRUCTION time (sink writes, consumer-state commits, IVF
  // layout builds) — they have their own specs. The iterative
  // clustering queries are NOT skipped: their construction runs the
  // LSH + label-propagation loop (localCheckpoint is eager, a few
  // seconds at sf0.001) and the loop's own subtree is checkpoint-
  // truncated out of the final plan (ClusterSpec covers it), but every
  // post-checkpoint stage — decontaminate join, quality floor, packing
  // — is still visible here and stays linted.
  private val stateful = Set("sink_versioned", "sink_listing",
    "cdc_consumer_state", "cdc_incremental_poll", "cdc_pagination",
    "cdc_reset", "llm_simsearch_ann", "cdc_deletes",
    // construction collects the key page eagerly; the interesting
    // half of its plan (feed collapse + top-K) is a LocalTableScan by
    // the time a lint could look — covered by PageQuerySpec instead
    "cdc_shred_documents",
    // write a tmp CSV/ORC copy at construction time
    "source_csv_ingest", "source_orc_roundtrip", "source_text_ingest",
    "source_partitioned_corpus", "source_json_roundtrip",
    "source_json_badrecords",
    // builds + refreshes the bucketed materialization at construction
    "view_materialized",
    // persists the cached entry at construction (the cache IS the
    // semantics; output checked by the oracle, protocol by
    // ResultCacheSpec)
    "view_cached_sql",
    // stages per-payload binary files at construction time
    "llm_multimodal_ingest",
    // writes the z-clustered scratch copy at construction time
    "layout_zorder_scan",
    // writes the IVF-PQ index scratch layout at construction time
    "llm_simsearch_ivfpq")

  test("no declared query plans a CartesianProduct or a global window") {
    import org.apache.spark.sql.execution.window.WindowExec
    // planNodes (SparkSpec) collects ALL physical nodes through AQE
    val plans = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => stateful(name) }
      .map { case (name, fn) =>
        name -> planNodes(fn(spark, sf).queryExecution.executedPlan)
      }
    val cartesian = plans.collect {
      case (name, ns) if ns.exists(
        _.getClass.getSimpleName.startsWith("CartesianProduct")) => name
    }
    assert(cartesian.isEmpty,
      s"queries planning a cartesian product: $cartesian")
    // a Window with an EMPTY partition spec serializes the whole input
    // through one task — the silent scale-killer this lint exists for
    val globalWindow = plans.collect {
      case (name, ns) if ns.exists {
        case w: WindowExec => w.partitionSpec.isEmpty
        case _ => false
      } => name
    }
    assert(globalWindow.isEmpty,
      s"queries planning a GLOBAL (unpartitioned) window: $globalWindow")
    // a window partitioned SOLELY on a known-low-cardinality key is
    // nearly as bad as a global one: at 100 TB one task sorts one
    // language's / event type's entire corpus. Exempt when the plan
    // carries a WindowGroupLimit (a rank<=k filter bounds each map
    // partition's emission to k rows per group before the exchange) or
    // the window input is a bounded aggregate (the hour grid).
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val lowCard = Set("lang", "event_type", "l_returnflag", "source",
      "status", "o_orderstatus")
    val boundedInput = Set(
      // windows over the per-(type, hour) AGGREGATED grid — group size
      // is bounded by the time range, not the corpus
      "window_gapfill", "window_interpolate")
    val lowCardWindow = plans.collect {
      case (name, ns) if !boundedInput(name) &&
        !ns.exists(_.getClass.getSimpleName.startsWith("WindowGroupLimit")) &&
        ns.exists {
          case w: WindowExec => w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall {
              case a: AttributeReference => lowCard(a.name)
              case _ => false
            }
          case _ => false
        } => name
    }
    assert(lowCardWindow.isEmpty,
      s"queries planning a whole-group window over a low-cardinality " +
        s"key (unsplittable at scale — use the ScalableRank two-pass " +
        s"shape): $lowCardWindow")
  }

  test("window_row_number / llm_quota_lang keep their WindowGroupLimit") {
    // the rank<=k filter over row_number is only scale-safe because
    // InferWindowGroupLimit turns it into Partial+Final WindowGroupLimit
    // (each map partition emits <=k rows per group BEFORE the exchange);
    // nothing else guards that the shape keeps optimizing
    for (name <- Seq("window_row_number", "llm_quota_lang")) {
      val ns = planNodes(SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan)
      val limits = ns.filter(
        _.getClass.getSimpleName.startsWith("WindowGroupLimit"))
      assert(limits.size >= 2, s"$name: expected Partial+Final " +
        s"WindowGroupLimit, plan has ${limits.size}")
    }
  }
}
