package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's change-data-capture page query re-expressed as one
  * declarative Spark plan.
  *
  * Semantics source: `sp_GetInvoiceChanges` (reference
  * sqls/storedprocedure.sql:4-57): union the header and line changefeeds
  * bounded by a snapshot version, collapse to MAX(change_version) per
  * invoice, rehydrate against current state, re-nest invoice lines as a
  * JSON array, and return the oldest-first top-K page.
  *
  * Testdata mapping (FIXTURES.md §C): `orders` plays InvoiceHeader,
  * `lineitem` plays InvoiceLine. The driver testdata has no change log for
  * these tables, so we derive a deterministic synthetic one: a header
  * change at version 2*o_orderkey, a line change at version
  * 2*l_orderkey+1. That keeps versions monotonic, collision-free between
  * the two feeds, and SQL-expressible for the DuckDB oracle.
  *
  * Scale notes (100 TB): the changefeed page is bounded by `limit`, so
  * every join against it is broadcast-able — the only shuffle in the plan
  * is the max-version aggregation over the (small) feed itself. The
  * rehydration join (J2) streams the big `orders` table past the broadcast
  * page; the line-nesting join shuffles `lineitem` once on its FK, which
  * at cluster scale should be bucket-partitioned on l_orderkey so the
  * shuffle disappears (see ChangeFeed for the state-table layout).
  */
object InvoiceCdc {

  /** S2 — header changefeed: (invoice_id, change_version), version > since.
    * Reference: CHANGETABLE(CHANGES InvoiceHeader, @since),
    * storedprocedure.sql:16-18. */
  def headerFeed(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").as("invoice_id"),
        (col("o_orderkey") * 2).as("change_version"))

  /** S2 — line changefeed mapped to its invoice id, one row per changed
    * line. Reference: CHANGETABLE(CHANGES InvoiceLine) INNER JOIN
    * InvoiceLine ON LineId, storedprocedure.sql:21-26. (The testdata has
    * no surrogate line PK — `(l_orderkey, l_linenumber)` is not unique —
    * so the FK is projected directly; the feed→detail join operator itself
    * is exercised by `join_line_feed` over events⋈customer.) */
  def lineFeed(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("invoice_id"),
      (col("l_orderkey") * 2 + 1).as("change_version"))

  /** U1 + A1 — merged feeds collapsed to the newest change per invoice,
    * bounded (sinceVersion, toVersion]. Reference: storedprocedure.sql:14-34. */
  def changedInvoices(spark: SparkSession, dir: String,
                      since: Long, to: Long): DataFrame =
    headerFeed(spark, dir).unionByName(lineFeed(spark, dir))
      .filter(col("change_version") > since && col("change_version") <= to)
      .groupBy(col("invoice_id"))
      .agg(max(col("change_version")).as("change_version"))

  /** The nested lines array, one row per invoice, ordered by line number
    * for determinism (reference FOR JSON PATH, storedprocedure.sql:42-52).
    * Integer-safe fields so the JSON text is byte-identical across engines:
    * qty is integral in the testdata; price is carried as cents. */
  def nestedLines(li: DataFrame): DataFrame =
    li.groupBy(col("l_orderkey").as("invoice_id"))
      .agg(to_json(sort_array(collect_list(struct(
        col("l_linenumber").cast("long").as("line_no"),
        col("l_partkey").as("part_key"),
        col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents")
      )))).as("lines"))

  /** The document projection shared by the single-plan page query and
    * the serving path — ONE definition, so the two can never drift from
    * their spec-proven equivalence (PageQuerySpec). Expects the page's
    * (invoice_id, change_version) joined against header columns and the
    * nested `lines`. Reference: storedprocedure.sql:36-53. */
  private def projectDocument(df: DataFrame): DataFrame =
    df.select(
      col("invoice_id"),
      concat(lit("INV-"), lpad(col("o_orderkey").cast("string"), 9, "0"))
        .as("invoice_number"),
      concat(lit("CUST-"), lpad(col("o_custkey").cast("string"), 6, "0"))
        .as("customer_code"),
      col("o_orderdate").as("invoice_date"),
      round(col("o_totalprice"), 2).as("total_amount"),
      col("change_version"),
      coalesce(col("lines"), lit("[]")).as("lines"))
      .orderBy(col("change_version"), col("invoice_id"))

  /** Collect a bounded oldest-first key page to the driver: the ≤limit
    * (invoice_id, change_version) cursor rows, ordered by (version, id).
    * THE single definition of the cursor ordering and row decoding,
    * shared by the serving path (ChangeFeed.poll) and the materialized
    * page query. */
  def collectKeyPage(keys: DataFrame, limit: Int): Array[(Long, Long)] =
    keys
      .orderBy(col("change_version"), col("invoice_id"))
      .limit(limit)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** The full page query: changed invoices → top-K page → rehydrate →
    * nest. Reference: storedprocedure.sql:35-56.
    *
    * The top-K is taken BEFORE the joins: rehydration is 1:1 (every
    * invoice exists in the header) and the nested-lines join is
    * 1:0..1, so `ORDER BY version LIMIT k` commutes with them. That
    * bounds everything downstream of the changefeed aggregation at k
    * rows — the page side is always broadcast-safe regardless of how
    * large the (since, to] window is, the big header table is never
    * shuffled (stream side of a broadcast-hash join), and lineitem is
    * semi-join pruned against the k-row page before the nest's groupBy,
    * so the only full-feed shuffle in the plan is the max-version
    * collapse itself. `limit` plans as TakeOrderedAndProject — the sort
    * never materializes globally. */
  def pageQuery(spark: SparkSession, dir: String,
                since: Long, to: Long, limit: Int): DataFrame = {
    val page = changedInvoices(spark, dir, since, to)
      .orderBy(col("change_version"), col("invoice_id"))
      .limit(limit)
    val hdr = Tables.orders(spark, dir)
    // semi-join prune with the SAME broadcast shape as the main join so
    // ReuseExchange computes the page pipeline once, not per join
    val li = Tables.lineitem(spark, dir)
    val pageLines = li.join(broadcast(page),
      li("l_orderkey") === page("invoice_id"), "left_semi")
    val lines = nestedLines(pageLines)
    projectDocument(
      broadcast(page)
        .join(hdr, page("invoice_id") === hdr("o_orderkey"), "inner")
        .join(broadcast(lines), Seq("invoice_id"), "left"))
  }

  /** The page query the way the serving path actually runs it
    * (ChangeFeed.poll): compute the bounded key page ONCE, collect its
    * ≤limit (invoice_id, change_version) rows, then assemble documents
    * against the literal page. Output-identical to [[pageQuery]]
    * (PageQuerySpec proves it), but the feed collapse — the only
    * full-feed shuffle — runs exactly once. In the single-plan form the
    * page subtree feeds two broadcast joins, and under AQE the two
    * broadcast stages are planned independently (exchange reuse across
    * them is not guaranteed), so the whole union+agg+top-K pipeline can
    * execute twice. At 100 TB that is the difference between one pass
    * over the changefeed per poll and two. */
  def pageQueryMaterialized(spark: SparkSession, dir: String,
                            since: Long, to: Long, limit: Int): DataFrame = {
    val keys = collectKeyPage(changedInvoices(spark, dir, since, to), limit)
    rehydratePage(spark, dir, keys.toSeq)
  }

  /** Rehydrate + nest an already-materialized key page — the ChangeFeed
    * poll path: the ≤limit (invoice_id, change_version) cursor rows were
    * collected driver-side (the reference holds the same rowset in JS),
    * so the document assembly joins run against a literal broadcast page
    * with ONE pass over the big tables and no feed re-computation. */
  def rehydratePage(spark: SparkSession, dir: String,
                    keys: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val page = broadcast(keys.toDF("invoice_id", "change_version"))
    val hdr = Tables.orders(spark, dir)
    val lines = nestedLines(Tables.lineitem(spark, dir)
      .join(broadcast(keys.map(_._1).toDF("l_orderkey")), Seq("l_orderkey"), "left_semi"))
    projectDocument(
      page
        .join(hdr, page("invoice_id") === hdr("o_orderkey"), "inner")
        .join(broadcast(lines), Seq("invoice_id"), "left"))
  }

  /** S3/A4 — snapshot bound: CHANGE_TRACKING_CURRENT_VERSION().
    * Reference: storedprocedure.sql:11-12. */
  def currentVersion(spark: SparkSession, dir: String): Long = {
    val row = headerFeed(spark, dir).unionByName(lineFeed(spark, dir))
      .agg(max(col("change_version"))).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** P4 — the composite resume cursor: strictly after (version, id) in
    * lexicographic order. Reference: invoice-api/server.js:165-168. */
  def resumeCursor(version: Long, lastId: Long): Column =
    col("change_version") > lit(version) ||
      (col("change_version") === lit(version) && col("invoice_id") > lit(lastId))
}
