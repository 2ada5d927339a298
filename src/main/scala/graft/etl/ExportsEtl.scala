package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{DedupLatest => _, _}

/** The reference pipeline itself (exports_results.sql, all 8 CTEs +
  * run_exports_query.py driver semantics), re-expressed Spark-first over an
  * `exports-deals-view`-shaped DataFrame (FIXTURES.md §A1; `results` is a
  * JSON-array STRING whose element shape is §A2).
  *
  * Design decisions (SURVEY.md §7.1):
  *  - JSON parsed ONCE into `ArrayType(LenderResult)` with all-STRING leaf
  *    fields, preserving the reference's string-comparison semantics
  *    (`= 'true'`, `= 'false'`, literal `'null'`;
  *    exports_results.sql:89-91,160-162) — numbers/booleans stringify the
  *    same way `json_extract_string` does.
  *  - `COUNT(DISTINCT …) OVER ()` / `SUM(…) OVER ()`
  *    (exports_results.sql:110-112) become broadcast crossJoin/join of
  *    pre-computed aggregates — no single-partition window at scale.
  *  - The correlated EXISTS (exports_results.sql:152-163) is a higher-order
  *    `exists` over the already-collected per-scenario array — no join.
  *  - Per-lender parametrization is a typed argument, and
  *    [[forAllLenders]] computes every lender in ONE pass (the reference
  *    re-runs the full query ~49× — SURVEY §4 "anti-optimization").
  */
object ExportsEtl {

  /** exports_results.sql:{start_date}/{end_date}/{lender_name}
    * (run_exports_query.py:214-218) as typed parameters. */
  final case class QueryParams(startDate: String, endDate: String,
                               lenderName: String)

  val PerformanceSchema: StructType = StructType(Seq(
    "lenderFailedServicing", "lenderFailedInScope", "lenderFailedOutOfScope",
    "lenderPassedServicing", "lenderExportWinner")
    .map(StructField(_, StringType)))

  val LenderResultSchema: StructType = StructType(Seq(
    StructField("lenderName", StringType),
    StructField("doesService", StringType),
    StructField("maxBorrowingCapacity", StringType),
    StructField("performance", PerformanceSchema)))

  val ResultsType: ArrayType = ArrayType(LenderResultSchema)

  private val DedupCols = Seq("results_arr", "exportedLender", "primaryIncome",
    "rateType", "loanPurpose", "totalProposedLoanAmount", "applicantCount",
    "householdCount", "transactionType", "dependantsCount", "lvr", "lvrBucket",
    "applicantsWithHecs", "paygIncome", "weeklyRentalIncome",
    "selfEmployedIncome", "exported_lender_result")

  /** Step 1 `base` (exports_results.sql:14-49): validity + half-open time
    * filter (parquet-pushable), one-shot JSON parse, and the
    * exported-lender element: first result whose lenderName equals the
    * ORIGINAL (pre-COALESCE) exportedLender, NULL when no match or lender
    * NULL — DuckDB `array_filter(...)[1]` ≡ `try_element_at(filter(...), 1)`
    * (both 1-based, NULL out of range). */
  def base(view: DataFrame, startDate: String, endDate: String): DataFrame =
    view
      .where(col("isValidExport") &&
        col("time") >= lit(startDate).cast("timestamp") &&
        col("time") < lit(endDate).cast("timestamp"))
      .withColumn("results_arr", from_json(col("results"), ResultsType))
      .withColumn("exported_lender_result",
        when(col("exportedLender").isNotNull,
          try_element_at(
            filter(col("results_arr"),
              r => r.getField("lenderName") === col("exportedLender")),
            lit(1))))
      .withColumn("exportedLender", coalesce(col("exportedLender"), lit("")))
      .drop("results")

  /** Step 2 `grouped_by_scenarioId` (exports_results.sql:51-81): latest
    * record per scenario via MAX + 16× MAX_BY, plus the non-null
    * exported-result list across ALL the scenario's records. Spark
    * `collect_list` drops NULLs natively ≡ DuckDB
    * `list_filter(list(x), x IS NOT NULL)` (documented equivalence, see
    * ExportsEtlSpec). Map-side partial aggregation keeps the shuffle at
    * O(scenarios).
    *
    * NULL subtlety: DuckDB's MAX_BY SKIPS NULL values, so the reference
    * takes — per column, independently — the value from the latest record
    * where that column is non-NULL. Spark's max_by would return the
    * (possibly NULL) value at the max key; masking the ordering key when
    * the value is NULL reproduces DuckDB exactly. Since round 6 the 16
    * masked `max_by`s are ONE [[graft.functions.ArgMaxFields]] typed
    * aggregate with identical semantics — hash aggregation
    * (ObjectHashAggregate) instead of the SortAggregate the string-typed
    * `max_by` buffers forced, and the ordering key is evaluated once per
    * row instead of 16 times.
    *
    * Tie-breaking: the reference's MAX_BY is nondeterministic on equal
    * `time` values. When `tieCol` is given (a non-negative unique id
    * carried on the input), ordering uses the COLLISION-FREE scalar
    * composite `epoch_µs(time) * 2^63 + tieCol`
    * ([[graft.operators.DedupLatest.ordKey128]]: DECIMAL(38,0) here,
    * HUGEINT in the oracle — identical total order, and distinct
    * (time, tie) rows always get distinct keys, so the 16 independent
    * MAX_BYs can never tear fields from different tied rows); `max(time)`
    * stays correct because the composite is monotone in time. Without
    * `tieCol` the reference's literal order-by-time semantics apply. */
  def dedupLatestPerScenario(df: DataFrame, tieCol: Option[Column] = None): DataFrame = {
    val ordKey = tieCol
      .map(t => graft.operators.DedupLatest.ordKey128(
        unix_micros(col("time")), t))
      .getOrElse(col("time"))
    graft.functions.ArgMaxFunctions.register(df.sparkSession)
    df.groupBy(col("scenarioId"))
      .agg(
        max(col("time")).as("time"),
        graft.functions.ArgMaxFunctions
          .argmax_fields(ordKey, DedupCols.map(col): _*).as("_latest"),
        collect_list(col("exported_lender_result")).as("exportedLendersResults"))
      .select(col("scenarioId") +: col("time") +:
        DedupCols.map(c => col("_latest").getField(c).as(c)) :+
        col("exportedLendersResults"): _*)
  }

  /** Step 3 `with_failing_export` (exports_results.sql:83-96): the
    * failing-export business rule, branch order preserved, string-compared
    * 'false'/'null'. */
  def withFailingExport(df: DataFrame): DataFrame = {
    val r = col("exported_lender_result")
    df.withColumn("failingExport",
      when(col("exportedLender") === "", true)
        .when(r.isNull ||
          r.getField("doesService") === "false" ||
          r.getField("maxBorrowingCapacity").isNull ||
          r.getField("maxBorrowingCapacity") === "null", true)
        .otherwise(false))
  }

  /** Step 4 `harsh_filtered` (exports_results.sql:98-105). */
  def filterFailing(df: DataFrame): DataFrame =
    df.where(!col("failingExport"))

  /** Step 5 `with_global_calculations` (exports_results.sql:107-115):
    * the three whole-table window aggregates in scalable form.
    *
    * The input is persisted HERE, not downstream: the crossJoin-of-
    * aggregates rewrite consumes `df` three times (row stream, global agg,
    * per-purpose counts), so an unpersisted input re-runs the whole
    * base→dedup pipeline per consumer (measured 3× the stage cost at
    * sf0.1). The cache manager dedupes by canonical plan, so repeated
    * builds of the same query reuse one InMemoryRelation. */
  def withGlobalCalculations(df: DataFrame): DataFrame = {
    val cached = df.persist()
    // `scenarioId` is the group key of the immediately-upstream
    // [[dedupLatestPerScenario]] aggregate, so it is UNIQUE here and the
    // reference's COUNT(DISTINCT scenarioId) ≡ count(scenarioId) — both
    // skip NULLs, distinct-ness is structural. Dropping the DISTINCT
    // removes the two-exchange distinct-rewrite from both global
    // aggregates (guide: never pay a distinct on already-unique data);
    // the oracle keeps COUNT(DISTINCT …) verbatim, and the differential
    // hash check pins the equivalence at every SF.
    val globals = GlobalAggs.withGlobal(cached, Seq(
      count(col("scenarioId")).as("count_all_unique_scenario_id"),
      sum(col("totalProposedLoanAmount"))
        .as("sum_all_total_proposed_loan_amount")))
    // Per-purpose counts aggregate `cached` DIRECTLY (not the crossJoined
    // `globals`): grouping the post-crossJoin relation dragged the 1-row
    // global broadcast into the counts branch as a redundant
    // BroadcastNestedLoopJoin below the aggregate. The group key ignores
    // the appended global columns, so the counts are identical.
    val purposeCounts = cached.groupBy(col("loanPurpose"))
      .agg(count(col("scenarioId")).as("count_all_loan_purpose"))
      .coalesce(1)
    globals.join(broadcast(purposeCounts), Seq("loanPurpose"), "left")
  }

  /** Steps 6+7 `lender_results`/`performance_extracted`
    * (exports_results.sql:117-145): per-lender matches exploded with the
    * `json_object('lenderName', lender)` stub when none match, then the
    * null-lenderName guard. `lenderCol` may be a literal (per-lender mode)
    * or a column (single-pass all-lenders mode). */
  def explodeForLender(df: DataFrame, lenderCol: Column): DataFrame = {
    val matched = filter(col("results_arr"),
      r => r.getField("lenderName") === lenderCol)
    val stub = struct(
      lenderCol.as("lenderName"),
      lit(null).cast(StringType).as("doesService"),
      lit(null).cast(StringType).as("maxBorrowingCapacity"),
      lit(null).cast(PerformanceSchema).as("performance"))
    df.withColumn("lender_result",
        ExplodeDefault.explodeWithDefault(matched, stub))
      .withColumn("associated_lender", col("lender_result.lenderName"))
      .withColumn("performance_json", col("lender_result.performance"))
      .where(col("associated_lender").isNotNull)
  }

  /** Step 8 `performance_result` (exports_results.sql:147-178): the
    * order-sensitive 7-label classification, with the correlated EXISTS as
    * a higher-order `exists` over the collected per-scenario array. */
  def classifyPerformance(df: DataFrame): DataFrame = {
    val p = col("performance_json")
    val secondary =
      col("associated_lender") =!= col("exportedLender") &&
        exists(col("exportedLendersResults"), r =>
          r.getField("lenderName") === col("associated_lender") &&
            r.getField("doesService") === "true" &&
            r.getField("maxBorrowingCapacity").isNotNull &&
            r.getField("maxBorrowingCapacity") =!= "null")
    df.withColumn("performance",
      when(secondary, "Secondary Export Deals")
        .when(p.isNull, "Not Available Scenarios")
        .when(p.getField("lenderFailedServicing") === "true",
          when(p.getField("lenderFailedInScope") === "true", "Failed In Scope Deals")
            .when(p.getField("lenderFailedOutOfScope") === "true",
              "Failed Out of Scope Deals")
            .otherwise("Unknown"))
        .when(p.getField("lenderPassedServicing") === "true",
          when(p.getField("lenderExportWinner") === "true", "Export Winner Deals")
            .otherwise("Deals Not Exported"))
        .otherwise("Unknown"))
  }

  /** Final projection (exports_results.sql:179-203): the 22 output
    * columns, JSON columns excluded for Tableau compatibility. The
    * reference query's trailing ORDER BY is applied by the CONSUMER —
    * [[forLender]] (the reference-faithful single query) sorts globally;
    * the per-lender write path sorts within each lender partition
    * (graft.etl.ReportJob.partitionedForWrite) and the verification dumps
    * apply their own total sort — a global range sort here would be
    * immediately destroyed by the write repartitioning and double-paid by
    * the dumps. */
  def finalProjection(df: DataFrame): DataFrame =
    df.select(
      col("associated_lender"), col("applicantCount"),
      col("applicantsWithHecs"), col("dependantsCount"),
      coalesce(col("exportedLender"), lit("")).as("exportedLender"),
      col("householdCount"), col("loanPurpose"), col("lvr"), col("lvrBucket"),
      col("paygIncome"), col("primaryIncome"), col("rateType"),
      col("scenarioId"), col("selfEmployedIncome"), col("time"),
      col("totalProposedLoanAmount"), col("transactionType"),
      col("weeklyRentalIncome"),
      col("count_all_loan_purpose"), col("count_all_unique_scenario_id"),
      col("sum_all_total_proposed_loan_amount"), col("performance"))

  /** The reference-faithful per-lender query (one `{lender_name}`),
    * including its trailing total ORDER BY (exports_results.sql:204-205). */
  def forLender(view: DataFrame, params: QueryParams,
                tieCol: Option[Column] = None): DataFrame = {
    val prepared = withGlobalCalculations(filterFailing(withFailingExport(
      dedupLatestPerScenario(base(view, params.startDate, params.endDate), tieCol))))
    finalProjection(classifyPerformance(
      explodeForLender(prepared, lit(params.lenderName))))
      .orderBy(col("associated_lender"), col("scenarioId"))
  }

  /** Single-pass all-lenders mode (SURVEY §7.3 step 6): the distinct
    * non-null lender list (S2) crossJoins the deduped scenarios — ONE scan
    * and one plan instead of the reference's query-per-lender loop; output
    * additionally carries `report_lender` for partitioned writes. */
  def forAllLenders(view: DataFrame, startDate: String, endDate: String,
                    tieCol: Option[Column] = None): DataFrame = {
    val prepared = withGlobalCalculations(filterFailing(withFailingExport(
      dedupLatestPerScenario(base(view, startDate, endDate), tieCol))))
    // Lender list from the RAW view, like the reference's get_lenders
    // (run_exports_query.py:38-45) — a lender whose scenarios all fail
    // still gets its report.
    // The lender list is bounded by the business's lender universe (the
    // reference loops over ~49), so the distinct's final merge coalesces
    // to one task — its input is mapper-count × |lenders| partially-
    // deduped rows, tiny at any corpus size after the map-side combine.
    val lenders = view
      .where(col("exportedLender").isNotNull)
      .select(col("exportedLender").as("report_lender")).distinct()
      .coalesce(1)
    val fanned = prepared.crossJoin(broadcast(lenders))
    finalProjection(classifyPerformance(
      explodeForLender(fanned, col("report_lender"))))
      .withColumn("report_lender", col("associated_lender"))
  }
}
