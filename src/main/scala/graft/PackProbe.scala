package graft

import org.apache.spark.sql.SparkSession

/** Bucket-count knob probe for the sequence packer: times
  * [[TrainQueries.packSequencesWith]] at several bucket counts on a
  * ScaleGen directory — demonstrating (with numbers, not claims) that
  * the registered query's fixed 8 buckets is an oracle-determinism
  * choice, not the operator's parallelism ceiling. Not part of the
  * driver contract.
  */
object PackProbe {
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
    for (buckets <- Seq(8, 64, 256)) {
      val df = TrainQueries.packSequencesWith(spark, sfDir, buckets)
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[packprobe] buckets=$buckets%-4d ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
