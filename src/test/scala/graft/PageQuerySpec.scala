package graft

import graft.cdc.InvoiceCdc

/** The serving-path page assembly (collect keys once → rehydrate against
  * the literal page) must be output-identical to the single-plan
  * declarative form for any window/limit. */
class PageQuerySpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("pageQueryMaterialized equals pageQuery across windows and limits") {
    for ((since, to, limit) <- Seq(
      (0L, Long.MaxValue, 100),
      (1000L, 2800L, 50),
      (500L, 600L, 7),
      (10L, 10L, 5) // empty window
    )) {
      val declarative = rows(InvoiceCdc.pageQuery(spark, sf, since, to, limit))
      val materialized = rows(InvoiceCdc.pageQueryMaterialized(spark, sf, since, to, limit))
      assert(materialized == declarative,
        s"mismatch at since=$since to=$to limit=$limit")
    }
  }
}
