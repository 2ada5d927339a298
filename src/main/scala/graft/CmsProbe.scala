package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.data.{Indexing, TextAnalysis}

/** Scratch micro-probe for the count-min query cost (round 7). Not part
  * of the driver contract. */
object CmsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val toks = Tables.memoBy(spark, s"cmstoks:$dir") {
      Tables.documentsHot(spark, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    }

    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[cmsprobe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    t("toks_only")(toks)
    t("one_bucket")(toks.withColumn("b0",
      Indexing.seededBucket(col("tok"), lit(0), 16)))
    t("cms_table")(Indexing.cmsTable(toks, "tok", 4, 16))
    t("exact_counts")(toks.groupBy(col("tok")).agg(count(lit(1)).as("c")))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      .withColumn("rn", row_number().over(Window.orderBy(desc("exact_cnt"), col("tok"))))
      .where(col("rn") <= 20).drop("rn")
    val est = Indexing.cmsEstimate(
      Indexing.cmsTable(toks, "tok", 4, 16), top, "tok", 4, 16)
    println(est.queryExecution.executedPlan.toString.take(6000))
    if (args.length > 1) t("estimate_join")(est)
    spark.stop()
  }
}
