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

  /** CDC / changelog application — the MERGE-INTO semantics of an
    * incremental ingest: each user's event stream is a changelog
    * (`error` = delete, anything else = upsert), and the final state is
    * the LATEST operation per key with deleted keys suppressed. One
    * map-side-combinable `max_by` aggregate on the collision-free
    * composite ordering key `ts_us * 2^63 + event_id`
    * ([[graft.operators.DedupLatest.ordKey128]], same construction as the
    * A1 exports dedup), shuffle O(keys); the delete filter is a
    * post-aggregation predicate, so tombstones never need a second
    * pass. */
  private def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val ck = graft.operators.DedupLatest.ordKey128(
      col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("op",
        when(col("event_type") === "error", "D").otherwise("U"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(col("user_id"))
      .agg(
        max_by(col("event_id"), ck).as("last_event_id"),
        max_by(col("ts_us"), ck).as("last_ts_us"),
        max_by(col("op"), ck).as("last_op"),
        max_by(col("cents"), ck).as("last_cents"),
        count(lit(1)).as("n_ops"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"))
      .where(col("last_op") === "U")
      .drop("last_op")
      .dumpOrdered("user_id")
  }

  /** SCD2 dimension versioning from the same changelog [[cdcApply]]
    * compacts: where CDC-apply keeps only each key's LATEST state (SCD1),
    * this emits the full version HISTORY — every upsert opens a version
    * valid over `[its ts, the next change's ts)`, the last version is
    * open-ended (NULL `valid_to_us`), and a delete tombstone closes the
    * preceding version without opening one, leaving a gap (the deleted
    * interval) exactly like a warehouse type-2 dimension.
    *
    * Scale: both windows partition BY KEY and order within the key's own
    * history — partition size is one entity's change count, never the
    * corpus — and they share one partitioning, so the plan is a single
    * exchange + sort feeding lead() and row_number(). */
  private def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("op",
        when(col("event_type") === "error", "D").otherwise("U"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      // the NEXT change (upsert or tombstone) closes this row's validity
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .where(col("op") === "U")
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("version"), col("event_id"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"), col("cents"),
        col("valid_to_us").isNull.as("is_current"))
      .dumpOrdered("user_id", "version")
  }

  /** Tumbling-window (1 h) per-type event aggregation — the batch twin of
    * the streaming windowed aggregate, as one map-side-combinable hash
    * aggregate on (type, bucket). Buckets are epoch-aligned on both
    * engines (Spark `window()` and DuckDB `time_bucket` share the
    * 1970-01-01T00:00Z origin); the boundary is emitted as unix micros so
    * no timestamp representation reaches the hash. Money sums stay
    * cents-exact in longs, the final average is the single double op. */
  private def timeBucket(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(col("event_type"),
        window(col("ts_ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .select(col("event_type"), unix_micros(col("w.start")).as("bucket_us"),
        col("n_events"),
        (col("sum_cents").cast("double") / lit(100.0)).as("sum_value"))
      .dumpOrdered("event_type", "bucket_us")

  /** Month-cohort retention matrix: users grouped by first-active month,
    * counted in every later month they return — the engagement-analysis
    * staple. Months are exact integer codes (year*12 + month, no date
    * arithmetic ambiguity). Three aggregates, each map-side combinable:
    * per-(user, month) distinct activity, per-user cohort (min month),
    * then the (cohort, offset) matrix; the cohort join-back stays
    * partitioned on user_id. */
  private def retentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables.events(spark, dir)
      .select(col("user_id"),
        (year(col("ts_ts")) * 12 + month(col("ts_ts"))).cast("long")
          .as("mcode"))
      .distinct()
    val cohort = activity.groupBy(col("user_id"))
      .agg(min(col("mcode")).as("cohort"))
    activity.join(cohort, Seq("user_id"))
      .groupBy(col("cohort"),
        (col("mcode") - col("cohort")).as("month_offset"))
      .agg(count(lit(1)).as("n_users"))
      .dumpOrderedTail("cohort", "month_offset")
  }

  /** View→purchase conversion funnel: each user's first `view`, their
    * first `purchase` STRICTLY AFTER it, and the conversion flag — the
    * ordered-step funnel a product pipeline computes per entity. Two
    * map-side-combinable aggregates (first-view, then first-qualifying-
    * purchase among events joined back on user_id) and a left join; no
    * window over the raw event timeline. `min(ts_us)` needs no
    * tie-break — the minimum of a set of longs is unique. */
  private def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val firstView = ev.where(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("first_view_us"))
    val firstPurchase = ev.where(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .where(col("ts_us") > col("first_view_us"))
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("first_purchase_us"))
    firstView.join(firstPurchase, Seq("user_id"), "left")
      .select(col("user_id"), col("first_view_us"),
        col("first_purchase_us"),
        col("first_purchase_us").isNotNull.as("converted"))
      .dumpOrdered("user_id")
  }

  private val ZBits = 10 // per-dimension bits in the Z-curve

  /** Z-order clustering stats: interleave (user bucket, hour bucket) into
    * a 20-bit Morton code, cluster into 64 z-ranges, and report each
    * range's per-dimension min/max span — the data-skipping layout for
    * queries that filter on user AND time (a single-column sort serves
    * one dimension; the Z-curve bounds BOTH spans per file, so parquet
    * min/max stats prune either predicate). The interleave is a 10-term
    * shift-and-mask sum — identical integer ops on both engines — and the
    * output is the per-range stats table a layout optimizer reads.
    * CorpusOpsSpec quantifies the skipping: mean per-range span ≤ 1/4 of
    * the global domain on both dimensions simultaneously. */
  private def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    def interleave(a: String, b: String): String =
      (0 until ZBits).map { i =>
        s"(((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i}))"
      }.mkString(" + ")
    val z = interleave("ub", "hb")
    Tables.events(spark, dir)
      .select(pmod(col("user_id"), lit(1024L)).as("ub"),
        pmod(expr("ts_us div 3600000000"), lit(1024L)).as("hb"))
      .withColumn("z", expr(z))
      .withColumn("zrange", expr("z div 16384")) // 64 ranges of the curve
      .groupBy(col("zrange"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ub")).as("ub_min"), max(col("ub")).as("ub_max"),
        min(col("hb")).as("hb_min"), max(col("hb")).as("hb_max"))
      .dumpOrderedTail("zrange")
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

    "data_cdc_apply" -> Q(cdcApply, Some(
      """WITH c AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    epoch_us(ts)::HUGEINT * 9223372036854775808 + event_id AS ck
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |    max_by(event_id, ck) AS last_event_id,
        |    max_by(ts_us, ck) AS last_ts_us,
        |    max_by(op, ck) AS last_op,
        |    max_by(cents, ck) AS last_cents,
        |    count(*) AS n_ops,
        |    CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_deletes
        |  FROM c GROUP BY user_id)
        |SELECT user_id, last_event_id, last_ts_us, last_cents, n_ops,
        |  n_deletes
        |FROM s WHERE last_op = 'U' ORDER BY user_id""".stripMargin)),

    "data_scd2_history" -> Q(scd2History, Some(
      """WITH c AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |v AS (
        |  SELECT *, lead(ts_us) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) AS valid_to_us
        |  FROM c),
        |u AS (
        |  SELECT user_id, event_id, ts_us AS valid_from_us, valid_to_us,
        |    cents,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS BIGINT) AS version
        |  FROM v WHERE op = 'U')
        |SELECT user_id, version, event_id, valid_from_us, valid_to_us,
        |  cents, valid_to_us IS NULL AS is_current
        |FROM u ORDER BY user_id, version""".stripMargin)),

    "data_time_bucket" -> Q(timeBucket, Some(
      """SELECT event_type,
        |  epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |    AS sum_value
        |FROM events GROUP BY event_type, bucket_us
        |ORDER BY event_type, bucket_us""".stripMargin)),

    "data_retention_cohort" -> Q(retentionCohort, Some(
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(year(ts) * 12 + month(ts) AS BIGINT) AS mcode
        |  FROM events),
        |c AS (SELECT user_id, min(mcode) AS cohort FROM a GROUP BY user_id)
        |SELECT cohort, mcode - cohort AS month_offset, count(*) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY cohort, month_offset
        |ORDER BY cohort, month_offset""".stripMargin)),

    "data_funnel" -> Q(funnel, Some(
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |fv AS (
        |  SELECT user_id, min(ts_us) AS first_view_us FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |fp AS (
        |  SELECT e.user_id, min(e.ts_us) AS first_purchase_us
        |  FROM e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > fv.first_view_us
        |  GROUP BY e.user_id)
        |SELECT user_id, first_view_us, first_purchase_us,
        |  first_purchase_us IS NOT NULL AS converted
        |FROM fv LEFT JOIN fp USING (user_id)
        |ORDER BY user_id""".stripMargin)),

    "data_zorder_layout" -> Q(zorderLayout, Some {
      val z = (0 until ZBits).map { i =>
        s"((((ub >> $i) & 1) << ${2 * i + 1}) + (((hb >> $i) & 1) << ${2 * i}))"
      }.mkString(" + ")
      s"""WITH d AS (
         |  SELECT user_id % 1024 AS ub,
         |    (epoch_us(ts) // 3600000000) % 1024 AS hb
         |  FROM events),
         |z AS (SELECT ub, hb, ($z) AS z FROM d)
         |SELECT z // 16384 AS zrange, count(*) AS n_events,
         |  min(ub) AS ub_min, max(ub) AS ub_max,
         |  min(hb) AS hb_min, max(hb) AS hb_max
         |FROM z GROUP BY zrange ORDER BY zrange""".stripMargin
    }),
  )
}
