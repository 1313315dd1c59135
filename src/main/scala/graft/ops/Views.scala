package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The BI view layer (SURVEY.md §3.3): the reference serves ad-hoc
  * Superset SQL over the denormalized `vw_invoice_header_line`
  * (sqls/vw_Invoicedetails.sql:5-19). Here the view is a registered
  * temp view; ad-hoc SQL is spark.sql over it — the full SQL surface
  * rides on Catalyst, so pushdown/pruning work through the view.
  */
object Views {

  /** Register the invoice-schema views over the testdata mapping
    * (FIXTURES.md §C): raw tables plus the denormalized join view. */
  def registerInvoiceViews(spark: SparkSession, dir: String): Unit = {
    Tables.orders(spark, dir).createOrReplaceTempView("invoice_header")
    Tables.lineitem(spark, dir).createOrReplaceTempView("invoice_line")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW vw_invoice_header_line AS
        |SELECT h.o_orderkey   AS invoice_id,
        |       h.o_custkey    AS customer_key,
        |       h.o_orderdate  AS invoice_date,
        |       h.o_orderstatus AS status,
        |       l.l_linenumber AS line_no,
        |       l.l_partkey    AS part_key,
        |       l.l_quantity   AS qty,
        |       l.l_extendedprice AS price
        |FROM invoice_header h
        |JOIN invoice_line l ON h.o_orderkey = l.l_orderkey
        |""".stripMargin)
  }

  /** An ad-hoc BI aggregation over the view layer, the Superset
    * SQL-Lab shape: revenue by status by month. Written as the tuned
    * form an analyst lands on: the naive
    * `count(DISTINCT invoice_id)` over the flattened view expands into
    * a three-level hash agg with two extra shuffles of line-grain
    * rows; pre-aggregating lines to per-order revenue first (ONE
    * shuffle on the high-cardinality order key), then joining 1:1 to
    * headers, makes the final (status, month) agg a plain row count —
    * same result (per_order is one row per order, headers join 1:1, and
    * orders without lines were excluded by the inner join before too). */
  def adhocRevenueByStatus(spark: SparkSession, dir: String): DataFrame = {
    registerInvoiceViews(spark, dir)
    spark.sql(
      """WITH per_order AS (
        |  SELECT l_orderkey,
        |         sum(CAST(round(l_quantity * l_extendedprice * 100) AS BIGINT))
        |           AS order_cents
        |  FROM invoice_line GROUP BY l_orderkey)
        |SELECT h.o_orderstatus AS status,
        |       date_format(h.o_orderdate, 'yyyy-MM') AS month,
        |       count(*) AS n_invoices,
        |       sum(p.order_cents) AS revenue_cents
        |FROM invoice_header h
        |JOIN per_order p ON h.o_orderkey = p.l_orderkey
        |GROUP BY 1, 2
        |ORDER BY status, month
        |""".stripMargin)
    // revenue summed as per-line integer cents: associative and exact, so
    // partial-aggregation order can never flip a cent (doubles would)
  }

  /** Register the full star schema for ad-hoc SQL (the Superset
    * "explore any table" surface): facts + every dimension. */
  def registerStarViews(spark: SparkSession, dir: String): Unit = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.nation(spark, dir).createOrReplaceTempView("nation_v")
    Tables.region(spark, dir).createOrReplaceTempView("region_v")
  }

  /** Ad-hoc SQL #2 — the TPC-H Q3 SHAPE (segment-filtered unshipped
    * revenue top-N) through the plain `spark.sql` surface: two
    * selective dimension filters, a three-way join, an integer-cents
    * revenue aggregate, top-10. What Catalyst does with it is the
    * point: the segment filter reduces customer to a broadcast side,
    * both date filters push to the parquet scans, and the top-10 is a
    * TakeOrderedAndProject — no global sort. Revenue as per-line
    * integer cents (round before sum) so partial-agg order is
    * irrelevant and the oracle hashes exactly. */
  def segmentTopOrders(spark: SparkSession, dir: String): DataFrame = {
    registerStarViews(spark, dir)
    spark.sql(
      """SELECT l.l_orderkey AS invoice_id,
        |       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |           AS BIGINT)) AS revenue_cents,
        |       date_format(o.o_orderdate, 'yyyy-MM-dd') AS order_date,
        |       o.o_orderpriority AS priority
        |FROM customer_v c
        |JOIN orders_v o ON c.c_custkey = o.o_custkey
        |JOIN lineitem_v l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        |GROUP BY 1, 3, 4
        |ORDER BY revenue_cents DESC, invoice_id
        |LIMIT 10
        |""".stripMargin)
  }

  /** Ad-hoc SQL #3 — the TPC-H Q5 SHAPE (regional revenue by nation)
    * through `spark.sql`: the snowflake walk region → nation →
    * customer → orders → lineitem with a region filter and a one-year
    * date band. The two tiny dims broadcast; the only real shuffle is
    * the customer⋈orders/orders⋈lineitem key — and the final
    * per-nation aggregate is 25 rows. Integer-cents revenue again. */
  def regionNationRevenue(spark: SparkSession, dir: String): DataFrame = {
    registerStarViews(spark, dir)
    spark.sql(
      """SELECT n.n_name AS nation,
        |       count(*) AS n_lines,
        |       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |           AS BIGINT)) AS revenue_cents
        |FROM region_v r
        |JOIN nation_v n ON n.n_regionkey = r.r_regionkey
        |JOIN customer_v c ON c.c_nationkey = n.n_nationkey
        |JOIN orders_v o ON o.o_custkey = c.c_custkey
        |JOIN lineitem_v l ON l.l_orderkey = o.o_orderkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1
        |ORDER BY revenue_cents DESC, nation
        |""".stripMargin)
  }
}
