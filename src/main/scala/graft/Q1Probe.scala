package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-format probe for the q1-class single-aggregate scan (the one
  * honest DuckDB win in BENCH_SCALE): times the same cents-exact
  * aggregate body over (a) the in-memory columnar cache
  * (`Tables.lineitemHot`, the shipped path) and (b) the parquet scan
  * directly — at multi-file probe SFs the vectorized parquet reader may
  * beat the cache's columnar decode, and the cache exists only to
  * restore parallelism over the single-row-group driver testdata. Not
  * part of the driver contract.
  *
  * Usage: `runMain graft.Q1Probe <sfDir>`.
  */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def body(src: DataFrame): DataFrame = {
      val qtyC = round(col("l_quantity") * 100).cast("long")
      val priceC = round(col("l_extendedprice") * 100).cast("long")
      val discC = round(col("l_discount") * 100).cast("long")
      src.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(qtyC).as("qty_c"), sum(priceC).as("price_c"),
          sum(priceC * (lit(100L) - discC)).as("disc_c4"),
          count(lit(1)).as("count_order"))
    }
    def time(label: String)(df: => DataFrame): Unit = {
      val plan = df
      plan.write.format("noop").mode("overwrite").save() // warm / fill cache
      val best = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        plan.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q1probe] $label%-22s $best%.3f s")
    }
    time("cached-hot (shipped)")(body(Tables.lineitemHot(spark, sfDir)))
    time("parquet-direct")(body(Tables.lineitem(spark, sfDir)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"), col("l_linestatus"))))
    spark.catalog.clearCache()
    time("parquet-direct-cold")(body(Tables.lineitem(spark, sfDir)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"), col("l_linestatus"))))
    spark.stop()
  }
}
