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
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val plan = df
      plan.write.format("noop").mode("overwrite").save() // warm
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        plan.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[packprobe] $label%-24s $best%.3f s")
      spark.catalog.clearCache()
    }
    for (buckets <- Seq(8, 64, 256))
      time(s"buckets=$buckets")(
        TrainQueries.packSequencesWith(spark, sfDir, buckets))
    // decomposition: where does the time go? accounting-only drops the
    // seq_text assembly (collect_list + array_sort + concat_ws); its gap
    // to the full query is the output-string cost, which scales with the
    // OUTPUT bytes, not the packing logic.
    import org.apache.spark.sql.functions._
    import graft.data.TextAnalysis
    time("accounting-only") {
      Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"),
          (col("doc_id") % TrainQueries.PackBuckets).as("bucket"))
        .withColumn("bin",
          expr(s"coalesce(sum(n_tok) over (partition by bucket order by doc_id" +
            s" rows between unbounded preceding and 1 preceding), 0L)" +
            s" div ${TrainQueries.PackBin}"))
        .groupBy(col("bucket"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
        .orderBy(col("bucket"), col("bin"))
    }
    spark.stop()
  }
}
