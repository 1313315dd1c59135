package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, attach the LATEST right row with the
  * same key and right time ≤ left time (the "most recent prior state"
  * lookup — price-at-trade, last-error-before-purchase, config-at-event).
  *
  * Spark has no built-in as-of join; the naive encodings are a range
  * join (O(n·m) pair explosion before the per-row max) or a
  * groupBy-collect of the whole right side per key (unbounded state).
  * This operator instead UNIONS the two sides with a tag and takes one
  * window pass per key ordered by (time, tag, tie): `last(right payload,
  * ignoreNulls)` over the unbounded-preceding frame carries the most
  * recent right row forward into each left row. Cost at any scale: ONE
  * shuffle on the key + a per-partition sort — the same exchange a plain
  * groupBy(key) would pay, independent of how many right rows precede
  * each left row.
  *
  * Semantics pinned against DuckDB's native ASOF LEFT JOIN (byte-equal
  * at sf0.001/sf0.01 — the `join_asof` oracle):
  *  - inclusive bound (right.time == left.time matches) — the tag orders
  *    right rows BEFORE left rows at equal time;
  *  - ties among right rows at the same (key, time) resolve to the
  *    largest `tieCol`. Here this operator is STRICTER than the pin:
  *    DuckDB leaves the tie choice unspecified, so the two engines only
  *    provably agree on inputs with no (key, time) right-side
  *    duplicates (true of the driver corpus; the totally-ordered window
  *    makes this side deterministic where a range-join + arbitrary max
  *    would not be);
  *  - a NULL-time right row never matches, and a NULL-time left row
  *    matches nothing (SQL comparison-with-NULL semantics, which ASOF
  *    inherits) — enforced below, since a raw NULLS FIRST sort would
  *    instead treat null time as "before everything";
  *  - left rows with no prior right row keep NULL right columns.
  *
  * Skew note (100 TB): the window serializes each key through one task,
  * so a pathologically hot key (one user with 10⁹ events) is the same
  * hazard as any per-key sort. The mitigation is composition, not a
  * different operator: pre-bucket by (key, coarse time bucket) and seed
  * each bucket with the previous bucket's closing right row — the
  * carry-in is one tiny row per bucket, and each bucket windows
  * independently (the `Curate.packShards` sharding argument).
  */
object AsofJoin {

  /** Left columns pass through unchanged; right columns (minus the key)
    * come back prefixed `r_`, NULL where no right row is at or before
    * the left row's time. `keyCol`/`timeCol` must exist on both sides;
    * `tieCol` must be non-null and unique per side within a (key, time)
    * for a fully deterministic result. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, tieCol: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.filterNot(_ == keyCol).toSeq
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields.filterNot(_.name == keyCol))
    val taggedL = left.select(
      col(keyCol).as("_k"), col(timeCol).as("_t"), col(tieCol).as("_tie"),
      lit(1).as("_tag"),
      struct(lCols.map(col): _*).as("_l"), lit(null).cast(rType).as("_r"))
    // null-time right rows can never satisfy r.time <= l.time; dropping
    // them here keeps them out of the NULLS FIRST sort, where last()
    // would otherwise carry them into every left row as "before
    // everything". Null-time LEFT rows stay (they sort first, see no
    // prior right row, and correctly come back with NULL right columns).
    val taggedR = right.filter(col(timeCol).isNotNull).select(
      col(keyCol).as("_k"), col(timeCol).as("_t"), col(tieCol).as("_tie"),
      lit(0).as("_tag"),
      lit(null).cast(lType).as("_l"),
      struct(rCols.map(col): _*).as("_r"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedL.unionByName(taggedR)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(lCols.map(c => col(s"_l.$c").as(c)) ++
        rCols.map(c => col(s"_m.$c").as(s"r_$c")): _*)
  }
}
