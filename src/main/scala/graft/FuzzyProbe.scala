package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._


/** Decomposes `data_decontaminate_fuzzy`'s cost at a probe SF: (a) the
  * signature scan alone, (b) compiled arr_eq_count pair scoring, (c) the
  * interpreted zip_with/filter HOF pair scoring — so the "compiled
  * expression is the next lever" claim is measured, not assumed.
  * Usage: `SPARK_GRAFT_SF_DIR=… runMain graft.FuzzyProbe`. */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ArrEqCountFunctions.register(spark)
    import graft.functions.ArrEqCountFunctions.arr_eq_count

    // the PRODUCTION signature plan — shared with decontaminateFuzzy so
    // the probe always measures the workload the query actually runs
    def sigs = DataQueries.fuzzySigPlan(spark, dir)
    def evalSigs = sigs.where(col("doc_id") < 10)
      .select(col("doc_id").as("eval_id"), col("sig").as("esig"))

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[fuzzyprobe] $tag: min ${reps.min}%.2f reps ${reps.map(r => f"$r%.2f").mkString(",")}")
    }

    time("sig_scan_only")(sigs.select(col("doc_id"), size(col("sig")).as("k")))
    val joined = sigs.where(col("doc_id") >= 10).crossJoin(broadcast(evalSigs))
    time("pairs_compiled")(joined.select(col("doc_id"), col("eval_id"),
      arr_eq_count(col("sig"), col("esig")).as("n_match")))
    time("pairs_hof")(joined.select(col("doc_id"), col("eval_id"),
      size(filter(zip_with(col("sig"), col("esig"), (a, b) => a === b),
        x => x)).cast("long").as("n_match")))
    time("pairs_compiled_agg")(joined
      .select(col("doc_id"), arr_eq_count(col("sig"), col("esig")).as("n"))
      .groupBy(col("doc_id")).agg(max(col("n"))))
    spark.stop()
  }
}
