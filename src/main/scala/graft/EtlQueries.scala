package graft

import graft.Out.OrderedOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.ExportsEtl

/** The reference pipeline run END TO END as an oracle-checked query: a
  * deterministic exports-deals-view is synthesized from `events` by pure
  * string arithmetic (identical expressions in both engines), then the
  * Spark side runs [[ExportsEtl.forAllLenders]] while the DuckDB oracle
  * replicates exports_results.sql VERBATIM (its own window functions,
  * `::JSON[]` lambda filters, and unnest-with-json_object-stub), fanned
  * over the distinct-lender list like run_exports_query.py's loop. This
  * cross-checks every rewrite the Spark engine makes (crossJoin globals,
  * HOF exists, typed one-shot JSON parse) against the reference's literal
  * formulation.
  */
object EtlQueries {

  /** k = props.k — the seed for all synthesized fields. Computed ONCE in
    * its own projection (like the oracle's `ev` CTE computes `k` once):
    * inlining the JSON-path extraction into every consumer re-parses
    * `props` ~40× per row — Catalyst's CSE does not fully fold the copies
    * across `when` branches, and the k-inlined formulation measured 3.4×
    * slower on the `base` stage at sf0.1 (6.2 s → 1.8 s). CollapseProject
    * keeps the extra projection because `k` is non-cheap and multiply
    * referenced. */
  private def k: Column = col("k")

  /** One JSON element of the results array; name i ∈ {0,1,2} is present
    * when (k+i) % 3 != 0 (exactly one of the three is always absent). */
  private def elemCol(name: String, i: Int): Column = {
    val ki = k + lit(i)
    val perf = concat(
      lit(""","performance":{"lenderPassedServicing":""""),
      when(ki % 3 =!= 0, "true").otherwise("false"),
      lit("""","lenderExportWinner":""""),
      when(ki % 4 === 0, "true").otherwise("false"),
      lit("""","lenderFailedServicing":""""),
      when(ki % 3 === 0, "true").otherwise("false"),
      lit("""","lenderFailedInScope":""""),
      when(ki % 2 === 0, "true").otherwise("false"),
      lit("""","lenderFailedOutOfScope":""""),
      when(ki % 3 === 0, "true").otherwise("false"),
      lit(""""}"""))
    when(ki % 3 =!= 0,
      concat(
        lit(s"""{"lenderName":"$name","doesService":""""),
        when(ki % 2 === 0, "true").otherwise("false"),
        lit("""","maxBorrowingCapacity":"""),
        when(ki % 5 === 0, lit("\"null\""))
          .otherwise(concat(lit("\""), (k * 100 + lit(i)).cast("string"), lit("\""))),
        when(ki % 7 === 0, lit("")).otherwise(perf),
        lit("}")))
  }

  /** The synthesized exports-deals-view (FIXTURES.md §A1 schema). Reads
    * [[Tables.eventsHot]]: the single-row-group testdata parquet scans as
    * ONE task, which would serialize the heavy string-synthesis +
    * `from_json` work of the downstream pipeline into that task; the
    * 32-way cache spreads it across cores. The pipeline's only
    * order-sensitive consumer is the per-scenario max_by; the view carries
    * `_tie` (the unique event_id) so the dedup can order by a composite
    * key that is deterministic by construction on BOTH engines — no data
    * property needed. */
  def synthView(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsHot(spark, dir)
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"))
      .select(
      col("ts_ts").as("time"),
      concat(lit("S"), (col("event_id") % 400).cast("string")).as("scenarioId"),
      concat(lit("["),
        concat_ws(",", elemCol("click", 0), elemCol("view", 1),
          elemCol("purchase", 2)),
        lit("]")).as("results"),
      when(col("event_type") === "error", lit(null).cast("string"))
        .otherwise(col("event_type")).as("exportedLender"),
      lit("PAYG").as("primaryIncome"),
      when(k % 2 === 0, "Fixed").otherwise("Variable").as("rateType"),
      when(k % 3 === 0, "Purchase").when(k % 3 === 1, "Refinance")
        .otherwise("Investment").as("loanPurpose"),
      round(col("value")).as("totalProposedLoanAmount"),
      (k % 5 + 1).as("applicantCount"),
      (k % 3 + 1).as("householdCount"),
      when(k % 2 === 0, "Purchase").otherwise("Refinance").as("transactionType"),
      (k % 4).as("dependantsCount"),
      ((k % 9) / 10.0).as("lvr"),
      concat(((k % 9) * 10).cast("string"), lit("-"),
        ((k % 9) * 10 + 10).cast("string")).as("lvrBucket"),
      (k % 2).as("applicantsWithHecs"),
      (k * 7 % 1000).cast("double").as("paygIncome"),
      (k * 3 % 500).cast("double").as("weeklyRentalIncome"),
      (k * 11 % 2000).cast("double").as("selfEmployedIncome"),
      (col("event_id") % 11 =!= 0).as("isValidExport"),
      col("event_id").as("_tie"))

  private def exportsE2e(spark: SparkSession, dir: String): DataFrame =
    ExportsEtl.forAllLenders(synthView(spark, dir), "2024-01-01", "2024-02-01",
        tieCol = Some(col("_tie")))
      .drop("report_lender")
      .withColumn("time_us", unix_micros(col("time")))
      .drop("time")
      .dumpOrdered("associated_lender", "scenarioId")

  /** DuckDB twin of [[elemCol]] (same string arithmetic, SQL dialect). */
  private def elemSql(name: String, i: Int): String = {
    val ki = s"(k + $i)"
    val perf =
      s"""',"performance":{"lenderPassedServicing":"' ||
         |        CASE WHEN $ki % 3 <> 0 THEN 'true' ELSE 'false' END ||
         |        '","lenderExportWinner":"' ||
         |        CASE WHEN $ki % 4 = 0 THEN 'true' ELSE 'false' END ||
         |        '","lenderFailedServicing":"' ||
         |        CASE WHEN $ki % 3 = 0 THEN 'true' ELSE 'false' END ||
         |        '","lenderFailedInScope":"' ||
         |        CASE WHEN $ki % 2 = 0 THEN 'true' ELSE 'false' END ||
         |        '","lenderFailedOutOfScope":"' ||
         |        CASE WHEN $ki % 3 = 0 THEN 'true' ELSE 'false' END || '"}'""".stripMargin
    s"""CASE WHEN $ki % 3 <> 0 THEN
       |      '{"lenderName":"$name","doesService":"' ||
       |        CASE WHEN $ki % 2 = 0 THEN 'true' ELSE 'false' END ||
       |        '","maxBorrowingCapacity":' ||
       |        CASE WHEN $ki % 5 = 0 THEN '"null"'
       |             ELSE '"' || CAST(k * 100 + $i AS VARCHAR) || '"' END ||
       |        CASE WHEN $ki % 7 = 0 THEN '' ELSE $perf END || '}'
       |    END""".stripMargin
  }

  /** The oracle: synthesized view + exports_results.sql's literal CTE
    * structure (windows, JSON lambdas, unnest-with-stub), fanned over the
    * distinct-lender list. `timeProj` is the final-SELECT projection of the
    * `time` column: the in-memory e2e compares unix micros, the CSV
    * round-trip compares a seconds-precision string (the reference CSV
    * dialect's timestamp grain — `yyyy-MM-dd HH:mm:ssxx`). */
  private def oracleSql(timeProj: String): String =
    s"""WITH ev AS (
       |  SELECT *, TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
       |  FROM events),
       |v AS (
       |  SELECT
       |    ts AS time,
       |    'S' || CAST(event_id % 400 AS VARCHAR) AS "scenarioId",
       |    '[' || concat_ws(',',
       |      ${elemSql("click", 0)},
       |      ${elemSql("view", 1)},
       |      ${elemSql("purchase", 2)}) || ']' AS results,
       |    CASE WHEN event_type = 'error' THEN NULL ELSE event_type END
       |      AS "exportedLender",
       |    'PAYG' AS "primaryIncome",
       |    CASE WHEN k % 2 = 0 THEN 'Fixed' ELSE 'Variable' END AS "rateType",
       |    CASE WHEN k % 3 = 0 THEN 'Purchase'
       |         WHEN k % 3 = 1 THEN 'Refinance'
       |         ELSE 'Investment' END AS "loanPurpose",
       |    round(value) AS "totalProposedLoanAmount",
       |    k % 5 + 1 AS "applicantCount",
       |    k % 3 + 1 AS "householdCount",
       |    CASE WHEN k % 2 = 0 THEN 'Purchase' ELSE 'Refinance' END
       |      AS "transactionType",
       |    k % 4 AS "dependantsCount",
       |    (k % 9) / 10.0 AS lvr,
       |    CAST((k % 9) * 10 AS VARCHAR) || '-' ||
       |      CAST((k % 9) * 10 + 10 AS VARCHAR) AS "lvrBucket",
       |    k % 2 AS "applicantsWithHecs",
       |    CAST(k * 7 % 1000 AS DOUBLE) AS "paygIncome",
       |    CAST(k * 3 % 500 AS DOUBLE) AS "weeklyRentalIncome",
       |    CAST(k * 11 % 2000 AS DOUBLE) AS "selfEmployedIncome",
       |    event_id % 11 <> 0 AS "isValidExport",
       |    event_id AS _tie
       |  FROM ev),
       |base AS (
       |  SELECT "time", "scenarioId", "results",
       |    COALESCE("exportedLender", '') AS "exportedLender",
       |    "primaryIncome", "rateType", "loanPurpose",
       |    "totalProposedLoanAmount", "applicantCount", "householdCount",
       |    "transactionType", "dependantsCount", "lvr", "lvrBucket",
       |    "applicantsWithHecs", "paygIncome", "weeklyRentalIncome",
       |    "selfEmployedIncome", _tie,
       |    CASE WHEN v."exportedLender" IS NOT NULL THEN (
       |      array_filter(results :: JSON [],
       |        x -> json_extract_string(x, 'lenderName') = v."exportedLender")
       |      ) [1]
       |    ELSE NULL END AS exported_lender_result
       |  FROM v
       |  WHERE "isValidExport" = true
       |    AND "time" >= TIMESTAMP '2024-01-01'
       |    AND "time" < TIMESTAMP '2024-02-01'),
       |grouped_by_scenarioId AS (
       |  SELECT "scenarioId", MAX("time") AS "time",
       |    MAX_BY(COALESCE("exportedLender", ''), epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "exportedLender",
       |    MAX_BY("primaryIncome", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "primaryIncome",
       |    MAX_BY("rateType", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "rateType",
       |    MAX_BY("loanPurpose", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "loanPurpose",
       |    MAX_BY("totalProposedLoanAmount", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "totalProposedLoanAmount",
       |    MAX_BY("applicantCount", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "applicantCount",
       |    MAX_BY("householdCount", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "householdCount",
       |    MAX_BY("transactionType", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "transactionType",
       |    MAX_BY("dependantsCount", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "dependantsCount",
       |    MAX_BY("lvr", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "lvr",
       |    MAX_BY("lvrBucket", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "lvrBucket",
       |    MAX_BY("applicantsWithHecs", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "applicantsWithHecs",
       |    MAX_BY("paygIncome", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "paygIncome",
       |    MAX_BY("weeklyRentalIncome", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "weeklyRentalIncome",
       |    MAX_BY("selfEmployedIncome", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "selfEmployedIncome",
       |    MAX_BY("results", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS "results",
       |    MAX_BY("exported_lender_result", epoch_us("time")::HUGEINT * 9223372036854775808 + _tie) AS exported_lender_result,
       |    list_filter(list(exported_lender_result), x -> x IS NOT NULL)
       |      AS exportedLendersResults
       |  FROM base GROUP BY "scenarioId"),
       |with_failing_export AS (
       |  SELECT *,
       |    CASE WHEN "exportedLender" = '' THEN true
       |         WHEN exported_lender_result IS NULL
       |           OR json_extract_string(exported_lender_result, 'doesService') = 'false'
       |           OR json_extract_string(exported_lender_result, 'maxBorrowingCapacity') IS NULL
       |           OR json_extract_string(exported_lender_result, 'maxBorrowingCapacity') = 'null'
       |           THEN true
       |         ELSE false END AS failingExport
       |  FROM grouped_by_scenarioId),
       |harsh_filtered AS (
       |  SELECT * FROM with_failing_export WHERE failingExport = false),
       |with_global_calculations AS (
       |  SELECT *,
       |    COUNT(DISTINCT "scenarioId") OVER () AS count_all_unique_scenario_id,
       |    COUNT(DISTINCT "scenarioId") OVER (PARTITION BY "loanPurpose")
       |      AS count_all_loan_purpose,
       |    SUM("totalProposedLoanAmount") OVER ()
       |      AS sum_all_total_proposed_loan_amount
       |  FROM harsh_filtered),
       |lenders AS (
       |  SELECT DISTINCT "exportedLender" AS lender FROM v
       |  WHERE "exportedLender" IS NOT NULL),
       |lender_results AS (
       |  SELECT g.*, l.lender,
       |    unnest(COALESCE(NULLIF(
       |      array_filter(results :: JSON [],
       |        r -> json_extract_string(r, 'lenderName') = l.lender), []),
       |      [json_object('lenderName', l.lender)])) AS lender_result
       |  FROM with_global_calculations g CROSS JOIN lenders l),
       |performance_extracted AS (
       |  SELECT *,
       |    json_extract_string(lender_result, 'lenderName') AS associated_lender,
       |    json_extract(lender_result, 'performance') AS performance_json
       |  FROM lender_results
       |  WHERE json_extract_string(lender_result, 'lenderName') IS NOT NULL),
       |performance_result AS (
       |  SELECT *,
       |    CASE
       |      WHEN associated_lender != "exportedLender"
       |        AND EXISTS (
       |          SELECT 1
       |          FROM unnest(exportedLendersResults :: JSON []) AS t(exported_result)
       |          WHERE json_extract_string(exported_result, 'lenderName') = associated_lender
       |            AND json_extract_string(exported_result, 'doesService') = 'true'
       |            AND json_extract_string(exported_result, 'maxBorrowingCapacity') IS NOT NULL
       |            AND json_extract_string(exported_result, 'maxBorrowingCapacity') != 'null')
       |        THEN 'Secondary Export Deals'
       |      WHEN performance_json IS NULL THEN 'Not Available Scenarios'
       |      WHEN json_extract_string(performance_json, 'lenderFailedServicing') = 'true' THEN
       |        CASE WHEN json_extract_string(performance_json, 'lenderFailedInScope') = 'true'
       |               THEN 'Failed In Scope Deals'
       |             WHEN json_extract_string(performance_json, 'lenderFailedOutOfScope') = 'true'
       |               THEN 'Failed Out of Scope Deals'
       |             ELSE 'Unknown' END
       |      WHEN json_extract_string(performance_json, 'lenderPassedServicing') = 'true' THEN
       |        CASE WHEN json_extract_string(performance_json, 'lenderExportWinner') = 'true'
       |               THEN 'Export Winner Deals'
       |             ELSE 'Deals Not Exported' END
       |      ELSE 'Unknown' END AS performance
       |  FROM performance_extracted)
       |SELECT associated_lender, "applicantCount", "applicantsWithHecs",
       |  "dependantsCount", COALESCE("exportedLender", '') AS "exportedLender",
       |  "householdCount", "loanPurpose", "lvr", "lvrBucket", "paygIncome",
       |  "primaryIncome", "rateType", "scenarioId", "selfEmployedIncome",
       |  $timeProj, "totalProposedLoanAmount",
       |  "transactionType", "weeklyRentalIncome", count_all_loan_purpose,
       |  count_all_unique_scenario_id, sum_all_total_proposed_loan_amount,
       |  performance
       |FROM performance_result
       |ORDER BY associated_lender, "scenarioId"""".stripMargin

  private def tmpDir(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_report/$name"

  /** S4+S6+S7+O2 as ONE oracle-checked chain — the reference's full outer
    * loop (run_exports_query.py per-lender CSVs + merge_all_lenders.py
    * consolidation): quarantine split → single-pass all-lenders report →
    * per-lender partitioned BOM'd CSV write → glob re-read → union-by-name
    * → consolidated single-file write → all-string re-read. The re-read is
    * cast back to source types (losslessness of the round-trip is the
    * property under test; the byte-level dialect assertions live in
    * CsvSpec/ReportJobSpec) and compared against the SAME DuckDB oracle as
    * ref_exports_pipeline_e2e, with `time` at the CSV dialect's
    * seconds-precision grain. */
  private def reportRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val merged = graft.etl.ReportJob.run(
      synthView(spark, dir), "2024-01-01", "2024-02-01",
      tmpDir("s7_out"), tmpDir("s7_result"))
    merged.select(
      col("associated_lender"),
      col("applicantCount").cast("long"),
      col("applicantsWithHecs").cast("long"),
      col("dependantsCount").cast("long"),
      col("exportedLender"),
      col("householdCount").cast("long"),
      col("loanPurpose"),
      col("lvr").cast("double"),
      col("lvrBucket"),
      col("paygIncome").cast("double"),
      col("primaryIncome"),
      col("rateType"),
      col("scenarioId"),
      col("selfEmployedIncome").cast("double"),
      date_format(to_timestamp(col("time"), "yyyy-MM-dd HH:mm:ssxx"),
        "yyyy-MM-dd HH:mm:ss").as("time_str"),
      col("totalProposedLoanAmount").cast("double"),
      col("transactionType"),
      col("weeklyRentalIncome").cast("double"),
      col("count_all_loan_purpose").cast("long"),
      col("count_all_unique_scenario_id").cast("long"),
      col("sum_all_total_proposed_loan_amount").cast("double"),
      col("performance"))
      .dumpOrdered("associated_lender", "scenarioId")
  }

  val defs: Seq[(String, Q)] = Seq(
    "ref_exports_pipeline_e2e" -> Q(exportsE2e,
      Some(oracleSql("""epoch_us("time") AS time_us""")), headline = true),
    "ref_s7_report_roundtrip" -> Q(reportRoundtrip,
      Some(oracleSql(
        """strftime("time", '%Y-%m-%d %H:%M:%S') AS time_str"""))))
}
