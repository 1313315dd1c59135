package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi join for skewed keys. A hash-partitioned join sends every
  * row of one key to one task; a pathologically hot key (the null-ish
  * default account, the empty-string language, the one customer doing
  * half the volume) therefore serializes its whole volume through a
  * single task no matter how many executors exist. Salting splits the
  * hot key's rows across `salt` sub-keys and replicates the OTHER side
  * `salt` times so every sub-key still finds its match — turning one
  * straggler task into `salt` even ones at the cost of a `salt`×
  * blow-up of the small side (cheap when that side broadcasts or is
  * dimension-sized).
  *
  * When to reach for this instead of AQE: AQE's skew-join handles
  * sort-merge joins it can re-plan, but not skew that lands in a
  * downstream AGGREGATION over the join key, not bucketed-table joins
  * whose exchange was already elided, and not stateful streaming joins
  * — the salt column composes through all of those (group by
  * (key, salt), then re-aggregate).
  *
  * Correctness does not depend on the salt assignment (any row→salt
  * spread works — matches happen within (key, salt) because the small
  * side carries every salt value); `saltBy` should be high-cardinality
  * (a row id) so hot-key rows actually spread. Deterministic given
  * deterministic `saltBy`, which is why `join_salted` can carry a
  * plain-join DuckDB oracle.
  */
object SkewJoin {

  /** Inner equi join of `big` (skewed side — rows spread by
    * `pmod(xxhash64(saltBy), salt)`) with `small` (replicated `salt`
    * times). Output columns = plain `big.join(small, key)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBy: Column, salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs must not carry a _salt column — it is the operator's " +
        "internal key and would be clobbered, then dropped, silently")
    val b = big.withColumn("_salt", pmod(xxhash64(saltBy), lit(salt.toLong)))
    val s = small.withColumn("_salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
