package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

/** Salted skew join: output-equivalence with the plain join on planted
  * skew, actual spread of a hot key across salt sub-keys, and the
  * (key, salt) shuffle shape when broadcasting is off the table. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // one pathologically hot key (90% of rows) + a long tail
  private lazy val big = ((1L to 9000L).map(i => (i, 7L)) ++
    (1L to 1000L).map(i => (9000L + i, i % 50)))
    .toDF("row_id", "key")
  private lazy val small = (0L until 50L).map(k => (k, s"dim-$k"))
    .toDF("key", "payload")

  test("salted join output equals the plain join") {
    val plain = big.join(small, "key")
      .select("row_id", "key", "payload")
      .as[(Long, Long, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(big, small, "key", col("row_id"), salt = 8)
      .select("row_id", "key", "payload")
      .as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("the hot key's rows spread across every salt value") {
    val spread = big.withColumn("_salt", pmod(xxhash64(col("row_id")), lit(8L)))
      .filter(col("key") === 7L)
      .groupBy("_salt").count().as[(Long, Long)].collect().toMap
    assert(spread.keySet == (0L until 8L).toSet,
      s"hot key must occupy all 8 salts: $spread")
    assert(spread.values.max < 9000L * 0.25,
      s"no salt may keep a dominating share: $spread")
  }

  test("plan shuffles on (key, salt) when the join cannot broadcast") {
    val plan = SkewJoin.saltedJoin(
      big, small.hint("merge"), "key", col("row_id"), salt = 8)
      .queryExecution.executedPlan.toString
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty && exchangeLines.forall(l =>
      l.contains("_salt")),
      s"join exchanges must partition on the salted key:\n$plan")
  }
}
