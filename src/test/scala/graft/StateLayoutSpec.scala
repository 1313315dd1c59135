package graft

import graft.plans.StateLayout
import org.apache.spark.sql.functions._

/** The bucketed-layout scale property: a state-table join on the bucket
  * key plans with zero shuffle exchanges (the layout-time shuffle is
  * amortized over every subsequent query). */
class StateLayoutSpec extends SparkSpec {

  test("bucketed header/line tables join without any shuffle exchange") {
    val o = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    StateLayout.writeBucketed(o, "t_orders_b", "o_orderkey", 8)
    StateLayout.writeBucketed(li, "t_lineitem_b", "l_orderkey", 8)

    // disable broadcast so the test proves co-location, not small-table luck
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = StateLayout.colocatedJoin(spark,
        "t_orders_b", "t_lineitem_b", "o_orderkey", "l_orderkey")
      assert(!StateLayout.hasShuffle(joined), "bucketed join must not shuffle")
      assert(joined.count() == li.count(), "inner FK join keeps every line")

      // the same join over raw (unbucketed) parquet DOES shuffle — the
      // property really comes from the layout
      val raw = o.join(li, o("o_orderkey") === li("l_orderkey"), "inner")
      assert(StateLayout.hasShuffle(raw))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed aggregation on the bucket key avoids the shuffle too") {
    StateLayout.writeBucketed(Tables.lineitem(spark, sf),
      "t_lineitem_b2", "l_orderkey", 8)
    val agg = spark.table("t_lineitem_b2")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    assert(!StateLayout.hasShuffle(agg),
      "groupBy on the bucket key must reuse the bucket partitioning")
    assert(agg.count() == Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count())
  }
}
