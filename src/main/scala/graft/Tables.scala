package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver testdata (TESTDATA.md, FIXTURES.md §B).
  *
  * Parquet is self-describing, so no schemas are forced here. One quirk:
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
  * unless `spark.sql.legacy.parquet.nanosAsLong` is set — we set it
  * idempotently on the session and expose the raw nanosecond long plus a
  * microsecond-truncated long (`ts_us`) and timestamp (`ts_ts`). DuckDB
  * v1.0 itself truncates ns→µs when reading the same parquet, so the µs
  * grain is the cross-engine-stable one used by every oracle-checked query.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** events with `ts` as raw ns long, plus µs long + µs timestamp columns. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime-settable legacy conf; required for TIMESTAMP(NANOS) parquet.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Epoch-microseconds of midnight UTC on the given ISO date. */
  def usOf(isoDate: String): Long =
    java.time.LocalDate.parse(isoDate)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
}
