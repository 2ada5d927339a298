package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** AsOfJoin.backward: brute-force equivalence on real data plus the edge
  * semantics the union+window rewrite must preserve (inclusive equal-time
  * match, left-join NULLs, NULL left times, multi-key grouping). */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the brute-force argmax formulation on events (sf0.001)") {
    val ev = Tables.events(spark, TestSpark.sf)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us").as("c_ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("p_ts"))

    val got = AsOfJoin.backward(purchases, clicks, Seq("user_id"),
        "p_ts", "c_ts", Seq("click_id"), prefix = "")
      .select("purchase_id", "c_ts", "click_id")

    // Brute force: inner-join all at-or-before clicks, keep the latest per
    // purchase, then left-join back so matchless purchases keep NULLs.
    val best = purchases.join(clicks, Seq("user_id"))
      .where(col("c_ts") <= col("p_ts"))
      .groupBy(col("purchase_id"))
      .agg(max(struct(col("c_ts"), col("click_id"))).as("m"))
    val brute = purchases.join(best, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("m.c_ts"), col("m.click_id"))

    assert(got.count() == purchases.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("equal-time right row matches (inclusive); unmatched rows keep NULL") {
    val right = Seq((1L, 10L, "r10"), (1L, 20L, "r20"), (2L, 99L, "r99"))
      .toDF("k", "rt", "pay")
    val left = Seq((1L, 10L, "exact"), (1L, 15L, "between"), (1L, 5L, "early"),
        (2L, 98L, "before"), (3L, 50L, "nokey"))
      .toDF("k", "lt", "tag")
    val got = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("pay"))
      .select("tag", "asof_rt", "asof_pay").as[(String, Option[Long], Option[String])]
      .collect().map { case (t, r, p) => t -> ((r, p)) }.toMap
    assert(got("exact") == ((Some(10L), Some("r10"))))   // rt == lt matches
    assert(got("between") == ((Some(10L), Some("r10"))))
    assert(got("early") == ((None, None)))               // left join semantics
    assert(got("before") == ((None, None)))
    assert(got("nokey") == ((None, None)))
  }

  test("plan shape: one hash exchange + one window, no join operator at all") {
    val left = Seq((1L, 5L, "a")).toDF("k", "lt", "tag")
    val right = Seq((1L, 3L, "p")).toDF("k", "rt", "pay")
    val plan = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("pay"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one hash exchange:\n$plan")
    assert("(?i)window".r.findAllIn(plan).nonEmpty, s"expected a window:\n$plan")
    // The scale property: as-of is NOT planned as any kind of join — no
    // range-join explosion, no broadcast nested loop, no cartesian.
    Seq("SortMergeJoin", "BroadcastNestedLoop", "CartesianProduct",
      "BroadcastHashJoin", "ShuffledHashJoin").foreach(op =>
      assert(!plan.contains(op), s"unexpected $op in:\n$plan"))
  }

  test("NULL-keyed or NULL-time right rows match nothing (SQL join semantics)") {
    val right = Seq((Some(1L), Some(10L), "ok"), (None, Some(5L), "nullkey"),
        (Some(1L), None, "nulltime"))
      .toDF("k", "rt", "pay")
    val left = Seq((Some(1L), 20L, "a"), (None: Option[Long], 20L, "nullk"))
      .toDF("k", "lt", "tag")
    val got = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("pay"))
      .select("tag", "asof_pay").as[(String, Option[String])].collect().toMap
    assert(got.size == 2, "left rows must all be preserved")
    assert(got("a").contains("ok"), "only the non-null right row may match")
    assert(got("nullk").isEmpty, "NULL keys never equal each other")
  }

  test("NULL left time never matches; left row count is preserved") {
    val right = Seq((1L, 10L, "r")).toDF("k", "rt", "pay")
    val left = Seq((1L, Some(11L), "a"), (1L, None, "nullt"))
      .toDF("k", "lt", "tag")
    val got = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("pay"))
    assert(got.count() == 2)
    val byTag = got.select("tag", "asof_pay").as[(String, Option[String])]
      .collect().toMap
    assert(byTag("a").contains("r") && byTag("nullt").isEmpty)
  }
}
