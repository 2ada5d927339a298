package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is a monthly batch job
  * (SURVEY.md §2.8 — no streams), so this is the additive streaming path a
  * Spark-native engine provides for the same data model: the `events`
  * table consumed incrementally with event-time windows + watermark, and
  * the reference's A1 latest-per-key dedup as a stateful streaming
  * operator.
  *
  * Scale notes: file-source micro-batches with `maxFilesPerTrigger` at
  * ingest; windowed aggregation state is bounded by the watermark (late
  * events beyond 10 minutes are dropped); `mapGroupsWithState` keeps O(1)
  * state per key (the current argmax row), partitioned by key across
  * executors — the streaming twin of the map-side-combined batch argmax.
  */
object EventStreams {

  /** events schema with `ts` as TIMESTAMP_NTZ µs, matching the current
    * driver testdata generation (and what `Tables.events` writes back out
    * when specs re-materialize it). Streaming sources require an explicit
    * schema, so unlike the dtype-adaptive batch reader this one is pinned;
    * change here if the driver regenerates with a different flavor. */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Incremental read of an events parquet path (file or glob), with the
    * same normalized `ts_us` (µs epoch long) + `ts_ts` (µs timestamp)
    * derivations as the batch reader. The NTZ→µs step is timezone-
    * independent (`timestampdiff` against the NTZ epoch literal). */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(EventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(path)
      .withColumn("ts_us",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"))
      .withColumn("ts_ts", timestamp_micros(col("ts_us")))

  /** Event-time windowed aggregate with watermark: per (1h window,
    * event_type) counts and cent-exact value sums. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_ts", "10 minutes")
      .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast(DecimalType(18, 2)) / 100)
          .cast(DecimalType(18, 2)).as("sum_value"))

  /** Watermarked per-window HLL REGISTER stream: approximate distinct
    * users per (1 h window, event type) with bounded state — the
    * streaming twin of `data_sketch_hll`. The stream's output IS the
    * register table (window, type, bucket, mj), the mergeable artifact:
    * registers at rest MAX-merge across any re-run or shard split, and
    * the estimate is a vocab-free batch fold at query time
    * ([[graft.data.Indexing.hllEstimate]] semantics — StreamingSpec
    * asserts single-batch register parity with the batch path and folds
    * the streamed registers to the same estimates). Exact
    * `count_distinct` is NOT expressible in a streaming aggregate (it
    * would need per-key value sets in state); 256 longs per group is
    * the whole point. State is watermark-bounded: closed windows emit
    * once (Append) and their registers leave the store. */
  def hllWindowRegisters(events: DataFrame): DataFrame = {
    val (bucket, rank) =
      graft.data.Indexing.hllBucketRank(col("user_id"))
    events
      .where(col("event_type").isNotNull && col("user_id").isNotNull)
      .withColumn("bucket", bucket)
      .withColumn("rank", rank)
      .withWatermark("ts_ts", "10 minutes")
      .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"),
        col("bucket"))
      .agg(max(col("rank")).as("mj"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("bucket"), col("mj"))
  }

  /** Typed event row over the NORMALIZED µs column — state logic never
    * touches the generation-dependent raw `ts`. */
  case class EventRow(event_id: Long, ts_us: Long, user_id: Long,
                      event_type: String, value: Double, props: String)
  case class LatestEvent(user_id: Long, last_ts_us: Long,
                         last_event_type: String, last_value: Double,
                         last_props: String)

  /** Streaming A1: latest record per user via per-key state — emits the
    * updated argmax row for each key touched in a micro-batch. */
  def latestPerUser(events: DataFrame): Dataset[LatestEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .as[EventRow]
      .groupByKey(_.user_id)
      .mapGroupsWithState[LatestEvent, LatestEvent](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[LatestEvent]) =>
          val candidate = rows.maxBy(_.ts_us)
          val best = state.getOption match {
            case Some(prev) if prev.last_ts_us >= candidate.ts_us => prev
            case _ => LatestEvent(userId, candidate.ts_us,
              candidate.event_type, candidate.value, candidate.props)
          }
          state.update(best)
          best
      }
  }

  /** Gap-based sessionization via `session_window`: per-user sessions that
    * close after more than [[gap]] of inactivity (closed-interval — an event
    * landing at exactly `last + gap` EXTENDS the session, a later one starts
    * a new session; asserted in StreamingSpec), with the session's event
    * count and cent-exact value sum. The same code path runs batch and
    * streaming: on a stream (with a watermark on `ts_ts`) Spark merges
    * per-micro-batch partial sessions in the state store and evicts a
    * session once the watermark passes its close — state is bounded by the
    * watermark horizon, the scalable sessionization shape (one shuffle on
    * `user_id`, partial session merge map-side, no per-user timeline
    * materialization).
    *
    * Session bounds are reported as observed event times (`min`/`max` of
    * `ts_us`), not the engine-specific `window.end = last + gap`, so the
    * output is engine-portable. */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts_ts"), gap).as("sw"))
      .agg(min(col("ts_us")).as("session_start"),
        max(col("ts_us")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"),
        (col("sum_cents").cast("double") / 100).as("sum_value"))

  /** Stream-stream interval join (attribution): each `click` joined to the
    * same user's `purchase` events landing within [click, click + 1h).
    * Both sides carry watermarks and the join condition bounds event time
    * on both sides, so the state store retains only rows inside the
    * watermark + interval horizon — the canonical bounded-state
    * stream-stream join (no unbounded buffering). Works identically on
    * batch DataFrames (same code path, Catalyst plans a plain join), which
    * is what the parity spec asserts. */
  def clickPurchaseAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val p = purchases.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    c.join(p, expr(
      "c_user = p_user AND p_ts >= c_ts AND p_ts < c_ts + interval 1 hour"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("value"))
  }

  /** Streaming exact dedup on event_id with WATERMARK-BOUNDED state:
    * `dropDuplicatesWithinWatermark` keeps a key's dedup state only until
    * the watermark passes its event time PLUS the delay (which is what
    * guarantees duplicates within `delay` of each other are caught), so
    * state is O(keys inside that bounded horizon) instead of O(all keys
    * ever seen) — the only
    * streaming dedup shape that survives an unbounded 100 TB/day stream
    * (plain `dropDuplicates` on a stream accumulates state forever).
    * Duplicates arriving later than the delay are NOT caught — that is the
    * documented at-least-once-within-horizon contract. On batch inputs
    * use plain `dropDuplicates`. */
  def dedupWithinWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts_ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  case class UserTotals(user_id: Long, n_purchases: Long, cents_total: Long)

  /** Per-user running purchase totals on the MODERN arbitrary-state API
    * (`transformWithState`, Spark 4): a [[StatefulProcessor]] holding one
    * [[ValueState]] row per user, with state TTL as a first-class config —
    * the operational upgrade over [[latestPerUser]]'s
    * `mapGroupsWithState` (typed state handles, optional timers,
    * per-state TTL instead of hand-rolled timeout bookkeeping). Requires
    * the RocksDB state store provider (set in the caller's session conf);
    * state stays O(1) per key, partitioned across executors.
    *
    * Updates are set-aggregative (count + cents sum), so per-batch
    * arrival order inside a key never changes the final state —
    * StreamingSpec asserts parity with the batch aggregate. */
  class RunningTotalsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, EventRow, UserTotals] {
    @transient private var totals: ValueState[UserTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals](
        "totals", Encoders.product[UserTotals], ttl)

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[UserTotals] = {
      var cur =
        if (totals.exists()) totals.get() else UserTotals(key, 0L, 0L)
      rows.foreach { r =>
        if (r.event_type == "purchase")
          // HALF_UP like Spark's round() in the batch twin — math.round is
          // floor(x+0.5), which diverges on negative halves (refunds)
          cur = UserTotals(key, cur.n_purchases + 1,
            cur.cents_total + BigDecimal(r.value * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
      totals.update(cur)
      Iterator.single(cur)
    }
  }

  /** [[RunningTotalsProcessor]] wired over an event stream: one updated
    * totals row per touched user per micro-batch (Update mode).
    *
    * Time mode follows the TTL: state TTL is only legal under
    * processing-time mode (Spark rejects a non-NONE TTL with
    * `TimeMode.None()` at query start), so passing a real `ttl` switches
    * the processor to `TimeMode.ProcessingTime()`; with the default
    * NONE the state machine stays time-agnostic. */
  def runningUserTotals(events: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .as[EventRow]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor(ttl),
        timeMode, OutputMode.Update())
  }

  /** Drive a streaming DataFrame to completion against a bounded input and
    * return the final results from a memory sink (test/verification
    * harness; production would use a real sink + checkpoint). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    df.sparkSession.table(name)
  }
}
