package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-format probe for the q1-class single-aggregate scan (the one
  * honest DuckDB win in BENCH_SCALE): times the SHIPPED aggregate body
  * ([[RefQueries.q1AggBody]] — shared, not copied, so the probe cannot
  * drift from the query) over (a) a FORCED repartition+persist cache
  * (built explicitly here — `Tables.lineitemHot` itself is layout-aware
  * and returns the direct scan at multi-file dirs, so calling it would
  * time the same plan twice) and (b) the parquet scan directly. At
  * multi-file probe SFs the vectorized parquet reader beats the cache's
  * columnar decode — the measurement behind lineitemHot's multiFile
  * switch. Not part of the driver contract.
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

    def narrow(): DataFrame = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"), col("l_linestatus"))
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
    val cached = narrow()
      .repartition(spark.sparkContext.defaultParallelism).persist()
    time("cached (forced)")(RefQueries.q1AggBody(cached))
    cached.unpersist()
    time("parquet-direct")(RefQueries.q1AggBody(narrow()))
    spark.catalog.clearCache()
    time("parquet-direct-cold")(RefQueries.q1AggBody(narrow()))
    spark.stop()
  }
}
