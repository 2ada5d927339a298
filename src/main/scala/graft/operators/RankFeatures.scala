package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 3-month rank/pivot time-series features (reference
  * run_exports_query.py:106-168): per (tier, entity, month) deal counts over
  * a 3-calendar-month lookback, rank within (tier, month) by count
  * descending with min-tie semantics (SQL RANK ≡ pandas rank(method='min')),
  * pivoted wide to the canonical five feature columns, then joined back.
  *
  * Scale notes: the feature table has at most |tiers|×|entities| rows, so
  * the join-back is always a broadcast join; the only shuffle is the count
  * aggregation (map-side combined). Pivot months are passed explicitly so
  * Spark skips the extra distinct-values job.
  */
object RankFeatures {

  /** yyyy-MM strings for the report month and its two predecessors. */
  def lookbackMonths(reportMonth: java.time.LocalDate): Seq[String] = {
    val m0 = reportMonth.withDayOfMonth(1)
    Seq(0, 1, 2).map(i => m0.minusMonths(i.toLong).toString.substring(0, 7))
  }

  /** Long-format counts+ranks: (tier, entity, month, cnt, rnk) for the three
    * lookback months only (reference P12/A3/W4).
    * `monthCol` must yield yyyy-MM strings. `weight` lets a caller count
    * pre-explode rows by their fan-out multiplicity instead of exploding
    * first — identical counts, one fewer pass over the exploded data.
    */
  def monthlyCountsRanked(df: DataFrame, tier: String, entity: String,
                          monthCol: Column, months: Seq[String],
                          weight: Option[Column] = None): DataFrame = {
    val counts = df
      .withColumn("month", monthCol)
      .where(col("month").isin(months: _*))
      .groupBy(col(tier), col(entity), col("month"))
      .agg(weight.fold(count(lit(1)))(w => sum(w).cast("long")).as("cnt"))
    // Everything past the count aggregate is bounded by
    // |tiers| × |entities| × 3 rows — enum-like constants at any corpus
    // size. Coalescing to one partition here lets the rank window AND the
    // caller's pivot aggregate run in that single task with NO further
    // exchange (SinglePartition satisfies every clustering requirement),
    // turning the 3-exchange feature branch into 1 exchange. The count
    // aggregate itself keeps full map-side parallelism; only the
    // bounded-size tail serializes — the static equivalent of AQE's
    // small-partition coalescing, which the bench session pins off.
    val w = Window.partitionBy(col(tier), col("month")).orderBy(col("cnt").desc)
    counts.coalesce(1).withColumn("rnk", rank().over(w).cast("long"))
  }

  /** Wide feature table (reference O3/O4): one row per (tier, entity) with
    * `scenario_count_current/one_month/two_months` (months[0..2]) and
    * `rank_in_tier_one_month/two_months` (months[1..2]), zero-filled like
    * pandas pivot_table(fill_value=0).
    */
  def rankPivot(df: DataFrame, tier: String, entity: String,
                monthCol: Column, months: Seq[String],
                weight: Option[Column] = None): DataFrame = {
    require(months.size == 3, s"need exactly 3 lookback months, got $months")
    val long = monthlyCountsRanked(df, tier, entity, monthCol, months, weight)
    val wide = long
      .groupBy(col(tier), col(entity))
      .pivot("month", months)
      .agg(first(col("cnt")).as("cnt"), first(col("rnk")).as("rnk"))
    wide.select(
      col(tier), col(entity),
      coalesce(col(s"${months(0)}_cnt"), lit(0L)).as("scenario_count_current"),
      coalesce(col(s"${months(1)}_cnt"), lit(0L)).as("scenario_count_one_month"),
      coalesce(col(s"${months(2)}_cnt"), lit(0L)).as("scenario_count_two_months"),
      coalesce(col(s"${months(1)}_rnk"), lit(0L)).as("rank_in_tier_one_month"),
      coalesce(col(s"${months(2)}_rnk"), lit(0L)).as("rank_in_tier_two_months"))
  }

  /** Join the wide features back onto every row (reference J2) — broadcast,
    * since the feature table is bounded by |tiers|×|entities|.
    */
  def withRankFeatures(df: DataFrame, tier: String, entity: String,
                       monthCol: Column, months: Seq[String]): DataFrame =
    df.join(broadcast(rankPivot(df, tier, entity, monthCol, months)),
      Seq(tier, entity), "left")
}
