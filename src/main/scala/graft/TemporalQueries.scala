package graft

import graft.Out.OrderedOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over the `events` table: distributed as-of join and
  * gap-based sessionization. Both are single-shuffle shapes (hash exchange
  * on `user_id` + per-partition sort / session merge) — the formulations
  * that survive a 100 TB event log. Oracled against DuckDB's native
  * `ASOF JOIN` and a gaps-and-islands window rewrite respectively, so the
  * cross-engine check covers the SEMANTICS (inclusive backward match,
  * half-open session gap), not just row counts.
  */
object TemporalQueries {

  private val SessionGapUs = 1800000000L // 30 minutes in microseconds

  /** Backward as-of join: each `purchase` picks up the same user's latest
    * `click` at-or-before the purchase time. Clicks are pre-deduplicated to
    * one per (user, µs) — `max(event_id)` — which both makes the operator
    * deterministic under time collisions and bounds the right side
    * ([[graft.operators.AsOfJoin]] determinism contract). */
  private def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us").as("click_ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("p_ts"), col("value"))
    graft.operators.AsOfJoin.backward(purchases, clicks, Seq("user_id"),
        leftTime = "p_ts", rightTime = "click_ts", payload = Seq("click_id"),
        prefix = "")
      .withColumn("gap_us", col("p_ts") - col("click_ts"))
      .dumpOrdered("purchase_id")
  }

  private val ForwardTolUs = 86400000000L // 1 day in microseconds

  /** Forward as-of with tolerance: each purchase picks the same user's
    * EARLIEST click at-or-after it, kept only when within one day — the
    * mirror direction plus the pandas-merge_asof-style match window, both
    * over the same single-shuffle union+window plan. Oracle: DuckDB ASOF
    * with the reversed inequality and the tolerance as a post-CASE (the
    * nearest match failing the tolerance means no match at all). */
  private def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us").as("click_ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("p_ts"), col("value"))
    graft.operators.AsOfJoin.forward(purchases, clicks, Seq("user_id"),
        leftTime = "p_ts", rightTime = "click_ts", payload = Seq("click_id"),
        prefix = "",
        tolerance = Some((lt, rt) => rt - lt <= ForwardTolUs))
      .withColumn("gap_us", col("click_ts") - col("p_ts"))
      .dumpOrdered("purchase_id")
  }

  /** Per-user sessions with a 30-minute inactivity gap
    * ([[graft.streaming.EventStreams.userSessions]] — the same function
    * sessionizes a stream with watermark-bounded state). */
  private def sessionize(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.userSessions(Tables.events(spark, dir))
      .dumpOrdered("user_id", "session_start")

  /** Per-user rolling features over the purchase stream — the ROWS-frame
    * window surface (moving sum/avg, lag delta, row_number) a feature
    * pipeline computes per entity. One hash exchange on `user_id` + one
    * per-partition sort serves ALL five windows (identical partitioning
    * and ordering → Spark plans a single Window operator, single sort).
    * Frame order is made total by construction — (ts_us, event_id) with
    * event_id unique — so lag/rolling values are deterministic regardless
    * of time collisions. Money sums run cents-exact in longs inside the
    * frame; the single division producing the moving average is the only
    * double op (frame-order float addition would differ between engines'
    * window implementations). */
  private def eventRolling(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val frame = w.rowsBetween(-6, 0)
    Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("delta_cents", col("cents") - lag(col("cents"), 1).over(w))
      .withColumn("roll7_cents", sum(col("cents")).over(frame))
      .withColumn("roll7_n", count(lit(1)).over(frame))
      .withColumn("roll7_avg",
        col("roll7_cents").cast("double") / col("roll7_n").cast("double"))
      .dumpOrdered("event_id")
  }

  val defs: Seq[(String, Q)] = Seq(
    "data_asof_join" -> Q(asofJoin, Some(
      """WITH c AS (
        |  SELECT user_id, epoch_us(ts) AS click_ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_ts, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, p.p_ts, p.value,
        |       c.click_ts, c.click_id, p.p_ts - c.click_ts AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.p_ts >= c.click_ts
        |ORDER BY purchase_id""".stripMargin)),

    "data_asof_forward" -> Q(asofForward, Some(
      s"""WITH c AS (
         |  SELECT user_id, epoch_us(ts) AS click_ts, max(event_id) AS click_id
         |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         |p AS (
         |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_ts, value
         |  FROM events WHERE event_type = 'purchase'),
         |j AS (
         |  SELECT p.user_id, p.purchase_id, p.p_ts, p.value,
         |         c.click_ts, c.click_id
         |  FROM p ASOF LEFT JOIN c
         |    ON p.user_id = c.user_id AND p.p_ts <= c.click_ts)
         |SELECT user_id, purchase_id, p_ts, value,
         |  CASE WHEN click_ts - p_ts <= $ForwardTolUs THEN click_ts END
         |    AS click_ts,
         |  CASE WHEN click_ts - p_ts <= $ForwardTolUs THEN click_id END
         |    AS click_id,
         |  CASE WHEN click_ts - p_ts <= $ForwardTolUs THEN click_ts - p_ts END
         |    AS gap_us
         |FROM j ORDER BY purchase_id""".stripMargin)),

    "data_sessionize" -> Q(sessionize, Some(
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS t, value FROM events),
         |m AS (
         |  SELECT user_id, t, value,
         |    CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
         |           OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
         |                > $SessionGapUs
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |s AS (
         |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY t
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM m)
         |SELECT user_id, min(t) AS session_start, max(t) AS session_end,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
         |    AS sum_value
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin)),

    "data_event_rolling" -> Q(eventRolling, Some(
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, event_id, ts_us, cents,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  cents - lag(cents, 1) OVER w AS delta_cents,
        |  CAST(sum(cents) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |       AS BIGINT) AS roll7_cents,
        |  count(*) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |    AS roll7_n,
        |  CAST(sum(cents) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |       AS DOUBLE)
        |    / CAST(count(*) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |           AS DOUBLE) AS roll7_avg
        |FROM p
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY event_id""".stripMargin)),
  )
}
