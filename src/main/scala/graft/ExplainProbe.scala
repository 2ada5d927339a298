package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: `runMain graft.ExplainProbe <sfDir> <name> [mode]`
  * prints the `.explain` of one registered query (formatted mode by
  * default) — the iterate-until-it's-the-plan-you-want loop without
  * regenerating all of PLANS.md. Not part of the driver contract.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val name = args.lift(1).getOrElse("ref_q1_agg")
    val mode = args.lift(2).getOrElse("formatted")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Registry.byName(name).build(spark, sfDir)
    df.explain(mode)
    spark.stop()
  }
}
