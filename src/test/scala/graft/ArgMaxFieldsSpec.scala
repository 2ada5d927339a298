package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArgMaxFunctions
import graft.operators.DedupLatest

/** [[graft.functions.ArgMaxFields]]: the typed argmax-row aggregate that
  * replaced the N × `max_by` fan-out in A1 dedup (round 6, VERDICT r5 #1).
  * Covers: semantic parity with the masked-max_by formulation, DuckDB
  * NULL-skip behavior, whole-row mode, NULL ordKeys, decimal ordKey128
  * keys, and — the point of the exercise — the ObjectHashAggregate plan
  * shape (no SortAggregate).
  */
class ArgMaxFieldsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mixedDf = Seq(
    // (key, ts, tie, a, b)
    ("k1", 1L, 1L, Some("a1"), Some(10)),
    ("k1", 3L, 2L, None, Some(30)),        // latest row: a NULL, b 30
    ("k1", 2L, 3L, Some("a2"), None),      // latest non-null a
    ("k2", 5L, 4L, Some("x"), Some(50)),
    ("k3", 7L, 5L, None, None),            // all-NULL payload
    ("k4", 4L, 6L, Some("w"), Some(40)),
    ("k4", 4L, 7L, Some("z"), Some(44))    // tie on ts, broken by tie id
  ).toDF("k", "ts", "tie", "a", "b")

  test("latestByScalar matches the masked max_by formulation on NULL-laden data") {
    val ordKey = DedupLatest.ordKey128(col("ts"), col("tie"))
    val fast = DedupLatest.latestByScalar(mixedDf, Seq("k"), "ts", ordKey, Seq("a", "b"))
    val ref = DedupLatest.latestByScalarMaxBy(mixedDf, Seq("k"), "ts", ordKey, Seq("a", "b"))
    assert(fast.columns.toSeq == ref.columns.toSeq)
    assert(fast.orderBy("k").collect().toSeq == ref.orderBy("k").collect().toSeq)
  }

  test("argmax_fields has DuckDB MAX_BY NULL-skip semantics per field") {
    val ordKey = DedupLatest.ordKey128(col("ts"), col("tie"))
    val got = DedupLatest.latestByScalar(mixedDf, Seq("k"), "ts", ordKey, Seq("a", "b"))
      .orderBy("k").collect().toSeq
    assert(got == Seq(
      Row("k1", 3L, "a2", 30), // a from ts=2 (latest non-null), b from ts=3
      Row("k2", 5L, "x", 50),
      Row("k3", 7L, null, null),
      Row("k4", 4L, "z", 44))) // ts tie broken by tie id 7 > 6
  }

  test("argmax_row takes every field (NULLs included) from the winning row") {
    ArgMaxFunctions.register(spark)
    val ordKey = DedupLatest.ordKey128(col("ts"), col("tie"))
    val got = mixedDf.groupBy("k")
      .agg(ArgMaxFunctions.argmax_row(ordKey, col("a"), col("b")).as("r"))
      .select(col("k"), col("r.a"), col("r.b"))
      .orderBy("k").collect().toSeq
    assert(got == Seq(
      Row("k1", null, 30), // whole row at ts=3: a IS NULL there
      Row("k2", "x", 50),
      Row("k3", null, null),
      Row("k4", "z", 44)))
  }

  test("rows with NULL ordKey are ignored (max_by semantics)") {
    ArgMaxFunctions.register(spark)
    val df = Seq(
      ("k1", Some(2L), "late"), ("k1", None, "nullkey"), ("k1", Some(1L), "early"),
      ("k2", Option.empty[Long], "only-null-key")
    ).toDF("k", "ts", "v")
    val got = df.groupBy("k")
      .agg(ArgMaxFunctions.argmax_fields(col("ts"), col("v")).as("r"))
      .select(col("k"), col("r.v"))
      .orderBy("k").collect().toSeq
    assert(got == Seq(Row("k1", "late"), Row("k2", null)))
  }

  test("latestByScalar plans ObjectHashAggregate, not SortAggregate") {
    val ordKey = DedupLatest.ordKey128(col("ts"), col("tie"))
    val plan = DedupLatest
      .latestByScalar(mixedDf, Seq("k"), "ts", ordKey, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
    assert(!plan.contains("SortAggregate"), s"unexpected SortAggregate in:\n$plan")
  }

  test("partial+final aggregation across shuffles survives serialize/deserialize") {
    ArgMaxFunctions.register(spark)
    // 200 keys x 40 rows over 8 partitions forces real map-side partials,
    // buffer serialization into the exchange, and final merges.
    val df = spark.range(8000)
      .select(
        (col("id") % 200).as("k"),
        (col("id") / 200).as("ts"),
        concat(lit("v"), col("id")).as("v"),
        when(col("id") % 7 === 0, col("id")).as("num"))
      .repartition(8)
    val got = df.groupBy("k")
      .agg(ArgMaxFunctions.argmax_fields(col("ts"), col("v"), col("num")).as("r"))
      .select(col("k"), col("r.v"), col("r.num"))
    val chk = df.groupBy("k")
      .agg(
        max_by(col("v"), when(col("v").isNotNull, col("ts"))).as("v"),
        max_by(col("num"), when(col("num").isNotNull, col("ts"))).as("num"))
    assert(got.orderBy("k").collect().toSeq == chk.orderBy("k").collect().toSeq)
  }
}
