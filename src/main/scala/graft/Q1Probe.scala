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
    // split-size sweep: at probe SFs the file bytes divided by the
    // default 128 MB target can undershoot the core count (e.g. sf10
    // lineitem ≈ 1.1 GB → ~9 scan partitions on 32 cores) — measure the
    // same plan at smaller split targets to separate "scan-bound" from
    // "parallelism-bound"
    for (mb <- Seq(64, 32, 16, 8)) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", s"${mb}MB")
      time(f"parquet-direct ${mb}MB")(RefQueries.q1AggBody(narrow()))
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", "32MB")
    // decomposition at the best split size: decode vs arithmetic vs
    // grouped aggregation
    time("decode only (5 cols)")(narrow().select(
      sum(col("l_quantity")), sum(col("l_extendedprice")),
      sum(col("l_discount")), count(col("l_returnflag")),
      count(col("l_linestatus"))))
    time("arith, global agg")(narrow().select(
      sum(round(col("l_quantity") * 100).cast("long")),
      sum(round(col("l_extendedprice") * 100).cast("long")),
      sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))),
      count(lit(1))))
    time("full q1 (grouped)")(RefQueries.q1AggBody(narrow()))
    // floor-form cents: (x*100 + 0.5)::long is pure codegen arithmetic
    // (Spark's Round allocates a BigDecimal per value); identical to
    // round-half-up on the positive, integer-cents-valued data
    def centsF(c: org.apache.spark.sql.Column) =
      (c * 100 + lit(0.5)).cast("long")
    time("q1 floor-form cents")(narrow()
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(centsF(col("l_quantity"))).as("qty_c"),
        sum(centsF(col("l_extendedprice"))).as("price_c"),
        sum(centsF(col("l_extendedprice")) *
          (lit(100L) - centsF(col("l_discount")))).as("disc_c4"),
        count(lit(1)).as("count_order")))
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16384")
    time("q1 batch 16384")(RefQueries.q1AggBody(narrow()))
    spark.conf.unset("spark.sql.parquet.columnarReaderBatchSize")
    // packed-int group key: (ascii(flag) << 8) | ascii(status) — primitive
    // key admits the vectorized fast hash map; chars unpack on the 6 rows
    def centsF2(c: org.apache.spark.sql.Column) =
      (c * 100 + lit(0.5)).cast("long")
    time("q1 packed-int key")(narrow()
      .groupBy((ascii(col("l_returnflag")) * 256 +
        ascii(col("l_linestatus"))).as("k"))
      .agg(sum(centsF2(col("l_quantity"))).as("qty_c"),
        sum(centsF2(col("l_extendedprice"))).as("price_c"),
        sum(centsF2(col("l_extendedprice")) *
          (lit(100L) - centsF2(col("l_discount")))).as("disc_c4"),
        count(lit(1)).as("count_order"))
      .select(expr("char(k div 256)").as("l_returnflag"),
        expr("char(k % 256)").as("l_linestatus"),
        col("qty_c"), col("price_c"), col("disc_c4"), col("count_order")))
    time("registered ref_q1_agg")(
      Registry.byName("ref_q1_agg").build(spark, sfDir))
    spark.conf.unset("spark.sql.files.maxPartitionBytes")
    time("registered (128MB)")(
      Registry.byName("ref_q1_agg").build(spark, sfDir))
    spark.stop()
  }
}
