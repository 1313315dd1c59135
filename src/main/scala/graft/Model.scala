package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The typed core entities (SURVEY.md §1.1/§1.3): case-class models of
  * the reference schemas with exact decimal money, and loaders that
  * adapt the driver testdata (FIXTURES.md §C mapping) onto them.
  *
  * Money is DECIMAL in the reference (setup-invoice-db.sql:31,49-50);
  * testdata carries doubles, so the loaders cast at the edge — once,
  * deterministically — and everything downstream of the typed API works
  * in exact decimals (or derived integer cents).
  */
case class InvoiceHeader(invoiceId: Long, invoiceNumber: String,
                         customerCode: String, invoiceDate: Date,
                         totalAmount: BigDecimal, lastUpdatedAt: Timestamp)

case class InvoiceLine(lineId: Long, invoiceId: Long, itemCode: String,
                       qty: BigDecimal, unitPrice: BigDecimal,
                       lineTotal: BigDecimal, lastUpdatedAt: Timestamp)

object Model {

  /** orders → Dataset[InvoiceHeader] (o_orderkey=id, derived
    * invoice/customer codes as in InvoiceCdc.pageQuery). */
  def invoiceHeaders(spark: SparkSession, dir: String): Dataset[InvoiceHeader] = {
    import spark.implicits._
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("invoiceId"),
      concat(lit("INV-"), lpad(col("o_orderkey").cast("string"), 9, "0"))
        .as("invoiceNumber"),
      concat(lit("CUST-"), lpad(col("o_custkey").cast("string"), 6, "0"))
        .as("customerCode"),
      col("o_orderdate").cast("date").as("invoiceDate"),
      col("o_totalprice").cast("decimal(12,2)").as("totalAmount"),
      col("o_orderdate").as("lastUpdatedAt"))
      .as[InvoiceHeader]
  }

  /** lineitem → Dataset[InvoiceLine]; lineTotal is the persisted
    * computed column Qty * UnitPrice (setup-invoice-db.sql:51), carried
    * at the reference's decimal(21,4)-style precision.
    *
    * lineId plays the reference's `LineId INT IDENTITY` — a UNIQUE
    * surrogate. The testdata has no line-level key ((l_orderkey,
    * l_linenumber) repeats — InvoiceCdc documents this), so the id is a
    * per-invoice dense sequence from a window over a deterministic full
    * ordering: orderkey * 10000 + seq. The window shuffle is the
    * identity-assignment cost, paid once at modeling time, exactly where
    * the reference pays its IDENTITY allocation. */
  def invoiceLines(spark: SparkSession, dir: String): Dataset[InvoiceLine] = {
    import spark.implicits._
    val seq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate"))
    Tables.lineitem(spark, dir).select(
      (col("l_orderkey") * 10000 + row_number().over(seq)).as("lineId"),
      col("l_orderkey").as("invoiceId"),
      concat(lit("ITEM-"), lpad(col("l_partkey").cast("string"), 9, "0"))
        .as("itemCode"),
      col("l_quantity").cast("decimal(10,2)").as("qty"),
      (col("l_extendedprice") / greatest(col("l_quantity"), lit(1.0)))
        .cast("decimal(10,2)").as("unitPrice"),
      (col("l_quantity").cast("decimal(10,2)") *
        (col("l_extendedprice") / greatest(col("l_quantity"), lit(1.0)))
          .cast("decimal(10,2)")).cast("decimal(21,4)").as("lineTotal"),
      col("l_shipdate").as("lastUpdatedAt"))
      .as[InvoiceLine]
  }

  /** Typed flavor of the BI view join (J3): header ⋈ lines. */
  def headerLinePairs(spark: SparkSession, dir: String)
      : Dataset[(InvoiceHeader, InvoiceLine)] = {
    val hs = invoiceHeaders(spark, dir)
    val ls = invoiceLines(spark, dir)
    hs.joinWith(ls, hs("invoiceId") === ls("invoiceId"), "inner")
  }
}
