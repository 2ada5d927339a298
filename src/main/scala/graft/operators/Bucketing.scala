package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the pre-shuffle that makes repeated big-fact
  * joins shuffle-free at 100 TB.
  *
  * Writing both sides bucketed (and sorted) by the join key lets Spark
  * plan a sort-merge join with NO Exchange on either side — each bucket
  * pair joins locally. At cluster scale this is the difference between
  * re-shuffling 100 TB per join and reading co-located buckets; the write
  * cost amortizes across every downstream join/aggregation on the key.
  * Bucket count should be sized so bucket × avg-row-size fits an executor
  * core's working set (hundreds of MB, not GB).
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — verify with
    * `.explain`: no Exchange above either scan. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
