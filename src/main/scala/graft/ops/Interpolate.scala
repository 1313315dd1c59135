package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear interpolation over a gridded time series — the resample step
  * every metrics/feature pipeline runs after gap-filling: missing
  * points take the line between their present neighbors; leading
  * (no previous neighbor) points backfill from the next, trailing
  * points carry the previous forward.
  *
  * Scale notes (100 TB): the four neighbor columns (last/first IGNORE
  * NULLS over value and time) share ONE window exchange on the series
  * key, and the window runs over the GRID (series × time steps), not
  * raw events — partition size is bounded by the time span whatever
  * the event volume. The interpolation fraction is exact epoch-ms
  * integer arithmetic in a single deterministic double divide, so the
  * result is engine-reproducible (the `window_interpolate` oracle).
  */
object Interpolate {

  private val TmpPrefix = "__graft_interp_"

  /** Fill the nullable `valueCol` (integer units, e.g. cents) of a
    * (key, time)-gridded series by linear interpolation. `timeCol`
    * must be a timestamp; rows are one per grid step per key. The
    * caller's frame must not carry `__graft_interp_*` columns (the
    * op's internal namespace — rejected rather than silently
    * overwritten). */
  def linear(grid: DataFrame, keyCol: String, timeCol: String,
             valueCol: String, outCol: String): DataFrame = {
    require(!grid.columns.exists(_.startsWith(TmpPrefix)),
      s"input columns may not start with $TmpPrefix (internal namespace)")
    val pv = TmpPrefix + "pv"; val ph = TmpPrefix + "ph"
    val nv = TmpPrefix + "nv"; val nh = TmpPrefix + "nh"
    val wp = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val tms = unix_millis(col(timeCol))
    val presentMs = when(v.isNotNull, tms)
    val interp: Column =
      when(v.isNotNull, v)
        .when(col(pv).isNull, col(nv))
        .when(col(nv).isNull, col(pv))
        .otherwise(round(col(pv) + (col(nv) - col(pv)) *
          ((tms - col(ph)).cast("double") /
           (col(nh) - col(ph)).cast("double"))))
    grid
      .withColumn(pv, last(v, ignoreNulls = true).over(wp))
      .withColumn(ph, last(presentMs, ignoreNulls = true).over(wp))
      .withColumn(nv, first(v, ignoreNulls = true).over(wn))
      .withColumn(nh, first(presentMs, ignoreNulls = true).over(wn))
      .withColumn(outCol, interp.cast("long"))
      .drop(pv, ph, nv, nh)
  }
}
