package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Csv, Sanitize, UnionByName}

/** The reference's two driver programs as one Spark job:
  * run_exports_query.py (per-lender report CSVs) + merge_all_lenders.py
  * (consolidated union) — but single-pass: one plan computes every lender
  * and a partitioned write fans the output into one directory per lender,
  * where the reference re-ran its query ~49 times and wrote files in a
  * Python loop.
  */
object ReportJob {

  /** The write-side partitioning: hash-shuffle on the partition column,
    * NOT coalesce(1) — each lender's rows land in one task → one file per
    * lender, written in parallel across lenders (AQE may still coalesce
    * tiny shuffles at toy scale; at real scale each lender keeps its own
    * task). Rows are sorted WITHIN each partition to reproduce the
    * reference query's ORDER BY inside every lender's file
    * (run_exports_query.py writes the sorted query result per lender) —
    * a global pre-sort would be destroyed by this repartitioning.
    * The sort LEADS with `report_lender`: `partitionBy("report_lender")`
    * makes FileFormatWriter require an ordering on the partition column,
    * and a sort that already satisfies it is reused as-is — otherwise the
    * writer plans its OWN sort on top and the intended per-file
    * (associated_lender, scenarioId) order would survive only via sort
    * stability, which Spark does not document. Within one write partition
    * report_lender is constant, so the trailing keys still give the
    * reference's per-file order. Exposed so ReportJobSpec can assert the
    * plan shape. */
  def partitionedForWrite(report: DataFrame): DataFrame =
    report.repartition(col("report_lender"))
      .sortWithinPartitions(
        col("report_lender"), col("associated_lender"), col("scenarioId"))

  /** Per-lender partitioned CSV write in the reference dialect
    * (run_exports_query.py:75-89): `outDir/report_lender=<lender>/…`,
    * tab-delimited, QUOTE_ALL, BOM, ''-null — the scalable
    * dynamic-partition write ([[partitionedForWrite]]). */
  def writePerLender(report: DataFrame, outDir: String): Unit = {
    partitionedForWrite(report)
      .write
      .partitionBy("report_lender")
      .option("sep", "\t")
      .option("header", true)
      .option("quoteAll", true)
      .option("nullValue", "")
      .option("emptyValue", "\"\"")
      .option("escape", "\\")
      .option("lineSep", "\n")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ssxx")
      .mode("overwrite")
      .csv(outDir)
    prependBomRecursive(report.sparkSession, outDir)
  }

  private def prependBomRecursive(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    // Skip _-prefixed dirs (Hadoop-hidden: _quarantine, _SUCCESS-style) —
    // only lender partition dirs carry CSVs that need the BOM.
    fs.listStatus(p)
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_"))
      .foreach { st => Csv.prependBom(spark, st.getPath.toString) }
  }

  /** Per-lender failure isolation (reference: run_exports_query.py:241-242
    * catches one lender's exception and CONTINUES the loop). The
    * single-pass plan has no per-lender exception boundary — a malformed
    * `results` JSON would not throw at all: `from_json` yields NULL under
    * Spark's permissive parsing and the scenario silently reclassifies
    * (exported_lender_result NULL → failingExport), poisoning the report
    * with no trace. The production shape of the reference's guard is
    * row-level quarantine at ingestion: split out rows whose non-null
    * `results` does not parse against [[ExportsEtl.ResultsType]], side-cart
    * them under `<outDir>/_quarantine/` (parquet — full row fidelity), and
    * run the report on the clean remainder. Finer-grained than the
    * reference: one poison row loses that ROW, not a whole lender's
    * report, and never fails the job.
    *
    * @return (clean rows, quarantined rows). */
  def splitQuarantine(view: DataFrame): (DataFrame, DataFrame) = {
    val malformed = col("results").isNotNull &&
      from_json(col("results"), ExportsEtl.ResultsType).isNull
    (view.where(!malformed), view.where(malformed))
  }

  /** merge_all_lenders.py: glob-read every per-lender file as all-string,
    * union by name, re-parse `time` leniently, write one consolidated
    * file. */
  def mergeAll(spark: SparkSession, outDir: String, resultDir: String): DataFrame = {
    val merged = UnionByName.all(Seq(
      Csv.readTabCsvAllString(spark, s"$outDir/*/*.csv")))
      .withColumn("time", Sanitize.coerceTimestamp(col("time")))
    Csv.writeTabCsv(merged, resultDir, singleFile = true)
    Csv.readTabCsvAllString(spark, resultDir)
  }

  /** Full monthly run: quarantine split → report → per-lender CSVs →
    * consolidated CSV. Quarantine is written AFTER the partitioned report
    * write — `.mode("overwrite")` on the report truncates `outDir` first,
    * which would otherwise delete the quarantine side-cart. */
  def run(view: DataFrame, startDate: String, endDate: String,
          outDir: String, resultDir: String): DataFrame = {
    val (clean, quarantined) = splitQuarantine(view)
    val report = ExportsEtl.forAllLenders(clean, startDate, endDate)
    writePerLender(report, outDir)
    quarantined.write.mode("overwrite").parquet(s"$outDir/_quarantine")
    mergeAll(view.sparkSession, outDir, resultDir)
  }
}
