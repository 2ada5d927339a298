package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.{Indexing, TextAnalysis}

/** Scratch micro-probe for the bloom membership expression cost (round 7).
  * Not part of the driver contract. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sh = Tables.documentsHot(spark, dir)
      .select(col("doc_id"), explode(array_distinct(TextAnalysis.shingles(
        TextAnalysis.tokens(col("text")), 3))).as("sh"))
    val bits = Indexing.bloomBits(
      sh.where(col("doc_id") < 10).select(col("sh")).distinct(), "sh", 3, 4096)
    val bitmap = Indexing.bloomBitmapString(bits, 4096)

    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[bloomprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    t("sh_explode_only")(sh.where(col("doc_id") >= 10))
    t("one_bucket")(sh.where(col("doc_id") >= 10)
      .withColumn("b0", Indexing.seededBucket(col("sh"), lit(0), 4096)))
    t("three_buckets")(sh.where(col("doc_id") >= 10)
      .withColumn("b0", Indexing.seededBucket(col("sh"), lit(0), 4096))
      .withColumn("b1", Indexing.seededBucket(col("sh"), lit(1), 4096))
      .withColumn("b2", Indexing.seededBucket(col("sh"), lit(2), 4096)))
    t("bucket_plus_substr")(sh.where(col("doc_id") >= 10)
      .withColumn("h0", lit(bitmap).substr(
        (Indexing.seededBucket(col("sh"), lit(0), 4096) + 1).cast("int"),
        lit(1)) === "1"))
    t("full_hit_col")(sh.where(col("doc_id") >= 10)
      .withColumn("hit", Indexing.bloomHitColumn(bitmap, col("sh"), 3)))
    t("full_query_agg")(sh.where(col("doc_id") >= 10)
      .withColumn("hit", Indexing.bloomHitColumn(bitmap, col("sh"), 3))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), count(when(col("hit"), lit(1))).as("f")))
    spark.stop()
  }
}
