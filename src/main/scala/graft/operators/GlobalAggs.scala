package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Whole-table window aggregates, rewritten scalably (reference W1–W3:
  * `COUNT(DISTINCT scenarioId) OVER ()`, `COUNT(DISTINCT …) OVER (PARTITION
  * BY loanPurpose)`, `SUM(…) OVER ()`, exports_results.sql:110-112).
  *
  * Spark rejects DISTINCT inside window functions outright, and an empty
  * `OVER ()` forces every row into ONE window partition — a single-task
  * bottleneck at scale. Both are replaced here by computing the aggregate
  * once (partial aggregation map-side, one tiny result) and joining it back
  * with a broadcast, which keeps the whole plan embarrassingly parallel.
  */
object GlobalAggs {

  /** Append global (whole-table) aggregates to every row:
    * `df.crossJoin(broadcast(df.agg(...)))` — the 1-row aggregate result is
    * broadcast, so no shuffle of `df` itself occurs.
    */
  def withGlobal(df: DataFrame, aggs: Seq[Column]): DataFrame =
    df.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*)))

  /** Append a per-group distinct count (W2): one row per `part` value is
    * computed and broadcast-joined back. Equivalent to
    * `COUNT(DISTINCT target) OVER (PARTITION BY part)` but with no
    * whole-partition window materialization.
    */
  def withGroupDistinctCount(df: DataFrame, part: String, target: String,
                             outName: String): DataFrame = {
    val counts = df.groupBy(col(part)).agg(count_distinct(col(target)).as(outName))
    df.join(broadcast(counts), Seq(part), "left")
  }

}
