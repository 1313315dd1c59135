package graft

import graft.ops.{ResultCache, Views}

/** TTL result cache over ad-hoc BI SQL (the reference's Redis cache in
  * front of Superset, CACHE_DEFAULT_TIMEOUT 300 s). */
class ResultCacheSpec extends SparkSpec {

  private val q =
    """SELECT status, count(*) AS n
      |FROM vw_invoice_header_line GROUP BY status ORDER BY status""".stripMargin

  test("hits within TTL return the identical cached frame; expiry re-runs") {
    Views.registerInvoiceViews(spark, sf)
    var now = 1000L
    val cache = new ResultCache(spark, ttlMillis = 300000L, clock = () => now)

    val first = cache.sql(q)
    val firstRows = first.collect()
    assert(cache.misses == 1 && cache.hits == 0)

    // identical text → same key, same frame
    val again = cache.sql(q)
    assert(again eq first, "fresh entry must be served as-is")
    assert(cache.hits == 1)

    // different whitespace is a DIFFERENT key: normalizing would also
    // rewrite whitespace inside string literals and cross-serve results
    val reformatted = cache.sql(q.replace("\n", "   \n "))
    assert(!(reformatted eq first))
    assert(cache.misses == 2 && cache.size == 2)

    // within TTL
    now += 299999L
    assert(cache.sql(q) eq first)

    // past TTL: the sweep evicts BOTH stale entries (including the
    // reformatted one, whose key is never requested again) and the
    // re-query installs a new frame
    now += 2L
    val renewed = cache.sql(q)
    assert(!(renewed eq first), "expired entry must re-run")
    assert(cache.misses == 3 && cache.size == 1,
      "never-requeried expired entries must be swept, not pinned")
    assert(renewed.collect().toSeq == firstRows.toSeq, "same data either way")
  }

  test("invalidate drops all entries (the data-changed hook)") {
    Views.registerInvoiceViews(spark, sf)
    var now = 0L
    val cache = new ResultCache(spark, ttlMillis = 300000L, clock = () => now)
    val before = cache.sql(q)
    cache.invalidate()
    assert(cache.size == 0)
    val after = cache.sql(q)
    assert(!(after eq before))
    assert(after.collect().toSeq == before.collect().toSeq)
  }
}
