package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupLatest

/** A/B probe for the A1 dedup aggregate forms at a given sf: isolates
  * where ref_a1_dedup_latest's time goes (scan floor vs aggregate cost vs
  * result dump) and compares the max_by SortAggregate against the
  * ArgMaxFields ObjectHashAggregate. Not part of the driver contract.
  */
object A1Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.eventsHot(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
        col("value"), col("props"))
    val ordKey = DedupLatest.ordKey128(col("ts_us"), col("event_id"))
    val payload = Seq("event_type", "value", "props")

    def time(name: String)(df: => DataFrame): Unit = {
      val plan = df
      plan.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        plan.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[a1probe] $name%-28s min ${ts.min}%.3f  reps ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    println(s"[a1probe] events rows: ${ev.count()}")
    time("tiny-1stage")(spark.range(100).toDF("i"))
    time("tiny-2stage")(
      spark.range(100).toDF("i").groupBy(col("i") % 10).agg(sum(col("i"))))
    time("scan-only")(ev)
    time("max-ts-only")(ev.groupBy("user_id").agg(max(col("ts_us"))))
    time("max-ts-4part")(
      ev.repartition(4).groupBy("user_id").agg(max(col("ts_us"))))
    time("maxby-16col-path")(
      DedupLatest.latestByScalarMaxBy(ev, Seq("user_id"), "ts_us", ordKey, payload))
    time("argmax-path")(
      DedupLatest.latestByScalar(ev, Seq("user_id"), "ts_us", ordKey, payload))
    time("argmax-long-ordkey")({
      graft.functions.ArgMaxFunctions.register(spark)
      ev.groupBy("user_id").agg(
        max(col("ts_us")).as("ts_us"),
        graft.functions.ArgMaxFunctions.argmax_fields(
          shiftleft(col("ts_us"), 20) + col("event_id") % 1048576,
          payload.map(col): _*).as("_l"))
    })
    time("full-a1-query")(Registry.byName("ref_a1_dedup_latest").build(spark, sfDir))
    spark.stop()
  }
}
