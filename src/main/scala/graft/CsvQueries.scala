package graft

import graft.Out.OrderedOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** The CSV sink/source contract as runnable queries (S4/S5/S6/S7/O2). These
  * exercise real write→read round-trips through the reference's byte-level
  * CSV dialect, then cast the all-string read-back to its source types so
  * the DuckDB oracle can hash-compare against the plain parquet projection
  * (the round-trip is lossless — that is the property under test; the
  * byte-level dialect assertions live in CsvSpec).
  */
object CsvQueries {

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_csv/$name"

  /** S4+S5: write the per-lender CSV shape (tab/QUOTE_ALL/BOM/ISO-offset
    * timestamps), validate, read back all-string (pandas dtype=str), then
    * cast the strings back to their source types. The oracle is the plain
    * parquet projection: the round-trip is lossless, and comparing TYPED
    * values sidesteps engine-specific float/timestamp stringification
    * (byte-level dialect assertions live in CsvSpec). The timestamp is
    * compared as a formatted string — engines disagree on dumped timestamp
    * physical types, not values. */
  private def s4RoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.orders(spark, dir)
      .where(col("o_orderkey") < 500)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    val path = tmp("s4_roundtrip")
    Csv.writeTabCsv(df, path, singleFile = true)
    val problems = Csv.validateWritten(spark, path, df.columns.toSeq)
    require(problems.isEmpty, s"CSV validation failed: $problems")
    Csv.readTabCsvAllString(spark, path)
      .select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderdate").as("o_orderdate_str"),
        col("o_orderpriority"))
      .dumpOrdered("o_orderkey")
  }

  /** S6+O2+S7: write two per-entity CSVs with drifted column sets, glob-read
    * all-string, union by name (missing → null), re-parse the timestamp
    * column leniently, write consolidated, read it back. */
  private def s6MergeAll(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir).where(col("o_orderkey") < 500)
    val a = base.where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"),
        col("o_totalprice"))
    val b = base.where(col("o_orderstatus") =!= "F")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Csv.writeTabCsv(a, tmp("merge_in/a"), singleFile = true)
    Csv.writeTabCsv(b, tmp("merge_in/b"), singleFile = true)
    val parts = Seq(
      Csv.readTabCsvAllString(spark, tmp("merge_in/a")),
      Csv.readTabCsvAllString(spark, tmp("merge_in/b")))
    val merged = UnionByName.all(parts)
      .withColumn("time_parsed", Sanitize.coerceTimestamp(col("o_orderdate")))
    Csv.writeTabCsv(merged, tmp("merge_out"), singleFile = true)
    // Typed cast-back of the consolidated file (see s4RoundTrip): drifted
    // columns stay NULL where their source file lacked them.
    Csv.readTabCsvAllString(spark, tmp("merge_out"))
      .select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_orderstatus"),
        col("o_orderdate").as("o_orderdate_str"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderpriority"),
        date_format(to_timestamp(col("time_parsed"), "yyyy-MM-dd HH:mm:ssxx"),
          "yyyy-MM-dd HH:mm:ss").as("time_parsed_str"))
      .dumpOrdered("o_orderkey")
  }

  /** S3+J1 (run_exports_query.py:223-225): the dimension arrives as a CSV
    * file (written here in the reference dialect), is read back all-string,
    * typed, broadcast, and left-joined — the literal competitor-list.csv
    * flow. The round-trip is lossless for these columns, so the oracle is
    * the plain parquet join. */
  private def s3CsvDimJoin(spark: SparkSession, dir: String): DataFrame = {
    val dimPath = tmp("s3_dim")
    Csv.writeTabCsv(Tables.nation(spark, dir), dimPath, singleFile = true)
    val dim = Csv.readTabCsvAllString(spark, dimPath)
      .select(col("n_nationkey").cast("int").as("n_nationkey"),
        col("n_name"))
    val c = Tables.customer(spark, dir)
    c.join(broadcast(dim), c("c_nationkey") === dim("n_nationkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("n_name"))
      .dumpOrdered("c_custkey")
  }

  val defs: Seq[(String, Q)] = Seq(
    "ref_s3_csv_dim_join" -> Q(s3CsvDimJoin, Some(
      """SELECT c_custkey, c_name, n_name
        |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY c_custkey""".stripMargin)),
    "ref_s4_csv_roundtrip" -> Q(s4RoundTrip, Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_str,
        |  o_orderpriority
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),
    "ref_s6_merge_all" -> Q(s6MergeAll, Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN o_orderstatus END AS o_orderstatus,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_str,
        |  CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS o_totalprice,
        |  CASE WHEN o_orderstatus <> 'F' THEN o_orderpriority END
        |    AS o_orderpriority,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS time_parsed_str
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),
  )
}
