package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every declared query (operator inventory, SURVEY.md §2) and
  * its DuckDB oracle twin. Column names match between the two sides; every
  * query ends in a deterministic ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full sp_GetInvoiceChanges pipeline: changefeed union → max-version
    * collapse → rehydrate → nested lines JSON → oldest-first top-K page. */
  def entry(spark: SparkSession): DataFrame =
    cdc.InvoiceCdc.pageQuery(spark, "/root/testdata/sf0.001",
      since = 0L, to = Long.MaxValue, limit = 100)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.RelationalOps.queries ++ cdc.CdcQueries.queries ++ llm.LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.RelationalOps.oracleSql ++ cdc.CdcQueries.oracleSql ++ llm.LlmQueries.oracleSql
}
