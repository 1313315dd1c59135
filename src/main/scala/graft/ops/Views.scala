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
}
