package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sketch/approximate aggregates — the 100 TB path for cardinality and
  * quantile questions. Exact `count_distinct` shuffles every distinct
  * value; HyperLogLog++ merges fixed-size registers map-side, so the
  * shuffle is O(groups × sketch-size) regardless of data volume. Same
  * story for KLL-style quantile sketches vs a full sort.
  *
  * Exact twins are provided for small-scale verification: the oracle gate
  * compares the exact forms; the approx forms are the documented
  * substitution at scale (relative error is a parameter).
  */
object Sketches {

  /** HLL++ distinct count, ~`rsd` relative standard deviation. */
  def approxDistinct(c: Column, rsd: Double = 0.01): Column =
    approx_count_distinct(c, rsd)

  /** Interpolated exact percentile (SQL `percentile`, same linear
    * interpolation as DuckDB's `quantile_cont`) — exact but requires a
    * sort per group; fine for bounded groups. */
  def percentileExact(c: Column, p: Double): Column =
    percentile(c, lit(p))

  /** Approximate percentile (Greenwald-Khanna), bounded error without the
    * per-group sort — the scale substitution for [[percentileExact]]. */
  def percentileApprox(c: Column, p: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(p), lit(accuracy))
}
