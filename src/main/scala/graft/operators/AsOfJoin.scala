package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join, backward and forward: each left row picks up
  * the payload of the nearest right row at-or-before (backward) /
  * at-or-after (forward) its time within the same key group (a LEFT
  * join — unmatched left rows keep NULL payload), optionally bounded by a
  * match tolerance.
  *
  * Implementation is the union+window shape, the scalable formulation of
  * as-of on a shared-nothing engine: tag both inputs, union them, and run
  * one window pass per key ordered by (time, side) carrying
  * `last(payload, ignoreNulls)`. Cost is a SINGLE hash shuffle on the key
  * plus a per-partition sort — no range-join row explosion, no per-row
  * binary search, and no driver-side time index. At 100 TB this is one
  * exchange of left+right and state bounded by the window frame (the
  * running payload), exactly how a sort-merge as-of would behave; a skewed
  * hot key can be pre-split by time range (the operator is composable with
  * [[Skew]] salting on the time bucket).
  *
  * Tie semantics: right rows sort BEFORE left rows at equal time (side 0 <
  * side 1), so a right row at exactly the left time matches (inclusive
  * `<=`, DuckDB `ASOF JOIN ... ON l.t >= r.t` semantics). Determinism
  * contract: the right side must be unique per (keys, rightTime) — callers
  * pre-aggregate duplicates (e.g. `max(event_id)` per key+time); with
  * duplicates the surviving payload would depend on partition-internal
  * order. Left rows at equal times are independent: each sees the same set
  * of preceding right rows, so their relative order cannot change results.
  *
  * NULL semantics match the SQL join they replace (DuckDB
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`): right rows with a
  * NULL key or NULL time can satisfy neither predicate and are dropped
  * before the union; left rows with NULL keys or NULL time are preserved
  * in the output but never match (a NULL-keyed left row shares its window
  * partition only with other left rows once null-keyed right rows are
  * gone, and a NULL left time sorts before every right row).
  */
object AsOfJoin {

  /** @param keys        equality keys present on both sides
    * @param leftTime    left event-time column (same type as `rightTime`)
    * @param rightTime   right event-time column
    * @param payload     right columns to attach to matching left rows
    * @param prefix      prefix for the attached columns (`rightTime` is
    *                    attached too, also prefixed)
    * @param tolerance   optional match window: predicate over (left time,
    *                    matched right time); a nearest match failing it is
    *                    NULLed out (no farther row is considered — exactly
    *                    the pandas `merge_asof(tolerance=...)` contract,
    *                    and the post-filter a SQL twin can express)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      prefix: String = "asof_",
      tolerance: Option[(Column, Column) => Column] = None): DataFrame =
    unionWindowJoin(left, right, keys, leftTime, rightTime, payload, prefix,
      forwardDir = false, tolerance)

  /** Forward as-of join: each left row picks up the payload of the right
    * row with the SMALLEST time `>=` the left row's time within the same
    * key group — the mirror of [[backward]] (inclusive, DuckDB
    * `ASOF JOIN ... ON l.t <= r.t`), same single-shuffle union+window
    * plan (traversed in descending time order), same determinism and NULL
    * contracts. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      prefix: String = "asof_",
      tolerance: Option[(Column, Column) => Column] = None): DataFrame =
    unionWindowJoin(left, right, keys, leftTime, rightTime, payload, prefix,
      forwardDir = true, tolerance)

  private def unionWindowJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      payload: Seq[String], prefix: String, forwardDir: Boolean,
      tolerance: Option[(Column, Column) => Column]): DataFrame = {
    val rp = struct((rightTime +: payload).map(col): _*)
    val rpType = right.select(rp.as("__rp")).schema.head.dataType
    val leftRest = left.columns.filterNot(keys.contains).toSeq
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val keyCols = keys.map(col)

    val lSide = left.select(
      keyCols ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(rpType).as("__rp")) ++ leftRest.map(col): _*)
    val rSide = right
      .where((rightTime +: keys).map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          rp.as("__rp")) ++
          leftRest.map(c => lit(null).cast(leftTypes(c)).as(c)): _*)

    // Backward walks time ascending (nearest preceding right row); forward
    // walks it descending (nearest following). Right rows sort before left
    // at equal (time): side 0 < side 1 under either direction, keeping the
    // match inclusive.
    val tOrd = if (forwardDir) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(tOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lSide.unionByName(rSide)
      .withColumn("__m0", last(col("__rp"), ignoreNulls = true).over(w))
    val bounded = tolerance match {
      case Some(p) => matched.withColumn("__m",
        when(p(col("__t"), col(s"__m0.$rightTime")), col("__m0")))
      case None => matched.withColumn("__m", col("__m0"))
    }
    bounded
      .where(col("__side") === 1)
      .select((keys ++ leftRest).map(col) ++
        (rightTime +: payload).map(p => col(s"__m.$p").as(prefix + p)): _*)
  }
}
