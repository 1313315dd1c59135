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

  /** An ad-hoc BI aggregation over the view, the Superset SQL-Lab
    * shape: revenue by status by month. */
  def adhocRevenueByStatus(spark: SparkSession, dir: String): DataFrame = {
    registerInvoiceViews(spark, dir)
    spark.sql(
      """SELECT status,
        |       date_format(invoice_date, 'yyyy-MM') AS month,
        |       count(DISTINCT invoice_id) AS n_invoices,
        |       sum(CAST(round(qty * price * 100) AS BIGINT)) AS revenue_cents
        |FROM vw_invoice_header_line
        |GROUP BY status, date_format(invoice_date, 'yyyy-MM')
        |ORDER BY status, month
        |""".stripMargin)
    // revenue summed as per-line integer cents: associative and exact, so
    // partial-aggregation order can never flip a cent (doubles would)
  }
}
