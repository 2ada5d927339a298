package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship composite on sf0.001 (driver smoke-checks rows > 0): the
    * reference pipeline's core shape — dedup-latest per key, global
    * aggregates, classification, dimension join and 3-month rank features —
    * in one plan over the events table. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.monthlyReport(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (name, q) => name -> q.build }.toMap

  /** DuckDB-equivalent oracle SQL per query (driver's correctness gate). */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case (name, Q(_, Some(sql), _)) => name -> sql }.toMap
}
