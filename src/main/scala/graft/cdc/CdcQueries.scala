package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declared-query surface for the CDC operators (SURVEY.md §2.1/§2.9).
  * The stateful consumer flavors (offset table, reset, sink) live in
  * ChangeFeed and are ScalaTest-verified; the queries here are the
  * SQL-expressible projections of the same semantics for the DuckDB oracle.
  */
object CdcQueries {
  type Q = (SparkSession, String) => DataFrame

  /** S2 — changefeed scan: rows with version > since
    * (CHANGETABLE(CHANGES t, @since), storedprocedure.sql:17). */
  val cdcScan: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") > 100)
      .select(col("event_id").as("change_version"),
        col("user_id").as("entity_id"))
      .orderBy("change_version")

  /** T2 — the flagship incremental poll page (sp_GetInvoiceChanges):
    * union feeds → bound (since, to] → max-version per invoice →
    * rehydrate → nested lines JSON → oldest-first top-K. */
  val cdcIncrementalPoll: Q = (s, d) =>
    InvoiceCdc.pageQuery(s, d, since = 1000L, to = 2800L, limit = 50)

  /** T3 — pagination with the composite resume cursor: the next page
    * strictly after (version, id), echoing `hasMore` consumption
    * (server.js:134,165-168 + consumer.js:34-37). */
  val cdcPagination: Q = (s, d) => {
    val page = InvoiceCdc.changedInvoices(s, d, 0L, Long.MaxValue)
      .filter(InvoiceCdc.resumeCursor(1001L, 500L))
      .orderBy("change_version", "invoice_id")
      .limit(100)
    page
  }

  val queries: Map[String, Q] = Map(
    "cdc_scan" -> cdcScan,
    "cdc_incremental_poll" -> cdcIncrementalPoll,
    "cdc_pagination" -> cdcPagination
  )

  val oracleSql: Map[String, String] = Map(
    "cdc_scan" ->
      """SELECT event_id AS change_version, user_id AS entity_id
        | FROM events WHERE event_id > 100 ORDER BY change_version""".stripMargin,
    "cdc_incremental_poll" ->
      """WITH feeds AS (
        |   SELECT o_orderkey AS invoice_id, o_orderkey * 2 AS change_version FROM orders
        |   UNION ALL
        |   SELECT l_orderkey, l_orderkey * 2 + 1 FROM lineitem),
        | agg AS (
        |   SELECT invoice_id, max(change_version) AS change_version
        |   FROM feeds WHERE change_version > 1000 AND change_version <= 2800
        |   GROUP BY invoice_id),
        | nested AS (
        |   SELECT l_orderkey AS invoice_id,
        |     to_json(list(struct_pack(
        |       line_no := CAST(l_linenumber AS BIGINT), part_key := l_partkey,
        |       qty := CAST(round(l_quantity, 0) AS BIGINT),
        |       price_cents := CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |       ORDER BY l_linenumber, l_partkey,
        |         CAST(round(l_quantity, 0) AS BIGINT),
        |         CAST(round(l_extendedprice * 100, 0) AS BIGINT))) AS lines
        |   FROM lineitem GROUP BY l_orderkey)
        | SELECT a.invoice_id,
        |   'INV-' || lpad(CAST(o.o_orderkey AS VARCHAR), 9, '0') AS invoice_number,
        |   'CUST-' || lpad(CAST(o.o_custkey AS VARCHAR), 6, '0') AS customer_code,
        |   o.o_orderdate AS invoice_date,
        |   round(o.o_totalprice, 2) AS total_amount,
        |   a.change_version,
        |   coalesce(n.lines, '[]') AS lines
        | FROM agg a
        | JOIN orders o ON a.invoice_id = o.o_orderkey
        | LEFT JOIN nested n ON a.invoice_id = n.invoice_id
        | ORDER BY a.change_version, a.invoice_id LIMIT 50""".stripMargin,
    "cdc_pagination" ->
      """WITH feeds AS (
        |   SELECT o_orderkey AS invoice_id, o_orderkey * 2 AS change_version FROM orders
        |   UNION ALL
        |   SELECT l_orderkey, l_orderkey * 2 + 1 FROM lineitem),
        | agg AS (
        |   SELECT invoice_id, max(change_version) AS change_version
        |   FROM feeds GROUP BY invoice_id)
        | SELECT invoice_id, change_version FROM agg
        | WHERE change_version > 1001 OR (change_version = 1001 AND invoice_id > 500)
        | ORDER BY change_version, invoice_id LIMIT 100""".stripMargin
  )
}
