package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("dbg").toString
    Seq(("s1", "2024-01-01 10:00:00", "alpha"))
      .toDF("scenarioId", "ts", "lender")
      .withColumn("time", col("ts").cast("timestamp")).drop("ts")
      .write.parquet(s"$base/batch_id=0")
    Seq(("s1", "2024-01-01 09:00:00", "beta"),
        ("s2", "2024-01-02 09:00:00", "gamma"))
      .toDF("scenarioId", "ts", "lender")
      .withColumn("time", col("ts").cast("timestamp")).drop("ts")
      .write.parquet(s"$base/batch_id=1")
    val full = spark.read.parquet(base).drop("batch_id")
    val agg = full.groupBy(col("scenarioId"))
      .agg(max(col("time")).as("time"),
        max_by(col("lender"), when(col("lender").isNotNull, col("time")))
          .as("lender"),
        collect_list(col("lender")).as("all"))
    agg.orderBy("scenarioId").show(false)
    spark.stop()
  }
}
