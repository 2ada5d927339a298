package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ExportsEtl
import graft.etl.ExportsEtl.QueryParams

/** Top-level so Spark can generate an Encoder (inner classes cannot). */
case class ExportsViewRow(time: Timestamp, scenarioId: String, results: String,
    exportedLender: Option[String], primaryIncome: String,
    rateType: String, loanPurpose: String,
    totalProposedLoanAmount: Option[Double],
    applicantCount: Option[Long], householdCount: Option[Long],
    transactionType: String, dependantsCount: Option[Long],
    lvr: Option[Double], lvrBucket: String,
    applicantsWithHecs: Option[Long], paygIncome: Option[Double],
    weeklyRentalIncome: Option[Double],
    selfEmployedIncome: Option[Double], isValidExport: Boolean)

/** Golden end-to-end test of the reference pipeline (SURVEY.md §5 item 2):
  * a hand-built exports-deals-view fixture hitting every failing-export
  * rule branch (exports_results.sql:86-93) and every performance label
  * (exports_results.sql:150-175), with hand-computed expected outputs.
  */
class ExportsEtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // JSON element helpers (results is a JSON-array STRING, FIXTURES.md §A1).
  private def res(lender: String, svc: String = "true", cap: String = "\"800000\"",
                  perf: String = null): String = {
    val p = if (perf == null) "" else s""","performance":$perf"""
    s"""{"lenderName":"$lender","doesService":$svc,"maxBorrowingCapacity":$cap$p}"""
  }
  private val winner =
    """{"lenderPassedServicing":"true","lenderExportWinner":"true"}"""
  private val notExported =
    """{"lenderPassedServicing":"true","lenderExportWinner":"false"}"""
  private val failedIn =
    """{"lenderFailedServicing":"true","lenderFailedInScope":"true"}"""
  private val failedOut =
    """{"lenderFailedServicing":"true","lenderFailedOutOfScope":"true"}"""
  private val failedNeither = """{"lenderFailedServicing":"true"}"""

  private def row(t: String, sid: String, results: Seq[String],
                  lender: Option[String], purpose: String = "Purchase",
                  amount: Double = 100.0, valid: Boolean = true): ExportsViewRow =
    ExportsViewRow(ts(t), sid, results.mkString("[", ",", "]"), lender, "PAYG", "Fixed",
      purpose, Some(amount), Some(2L), Some(1L), "Purchase", Some(0L),
      Some(0.8), "70-80", Some(0L), Some(120000.0), Some(500.0), Some(0.0),
      valid)

  private lazy val view: DataFrame = Seq(
    // s1: 2 records — dedup keeps the later (alpha export, winner perf);
    // beta present with failed-in-scope perf; gamma absent.
    row("2024-01-01 10:00:00", "s1",
      Seq(res("alpha", perf = winner), res("beta", perf = failedIn)),
      Some("alpha")),
    row("2024-01-01 09:00:00", "s1", Seq(res("beta", perf = failedIn)),
      Some("beta")),
    // s2: latest exported beta; an EARLIER record exported alpha
    // (serviceable) -> alpha is in exportedLendersResults -> for lender
    // alpha: Secondary Export Deals.
    row("2024-01-02 10:00:00", "s2",
      Seq(res("beta", perf = winner), res("alpha", perf = notExported)),
      Some("beta")),
    row("2024-01-02 09:00:00", "s2", Seq(res("alpha", perf = notExported)),
      Some("alpha")),
    // s3: NULL exportedLender -> failingExport -> filtered out.
    row("2024-01-03 10:00:00", "s3", Seq(res("alpha", perf = winner)), None),
    // s4: exported gamma but gamma doesService='false' -> failing.
    row("2024-01-04 10:00:00", "s4",
      Seq(res("gamma", svc = "\"false\"", perf = winner)), Some("gamma")),
    // s5: exported alpha with literal-'null' capacity -> failing.
    row("2024-01-05 10:00:00", "s5",
      Seq(res("alpha", cap = "\"null\"", perf = winner)), Some("alpha")),
    // s6: alpha fine; epsilon failed-servicing with neither scope flag
    // (-> Unknown); zeta passed but not winner (-> Deals Not Exported);
    // eta failed-out-of-scope. delta absent (-> stub, Not Available).
    row("2024-01-06 10:00:00", "s6",
      Seq(res("alpha", perf = winner), res("epsilon", perf = failedNeither),
        res("zeta", perf = notExported), res("eta", perf = failedOut),
        res("theta", perf = failedIn)),
      Some("alpha"), purpose = "Refinance", amount = 200.0),
    // s9: the LATEST record's exportedLender (alpha) is absent from its
    // own results -> its exported_lender_result is NULL; DuckDB MAX_BY
    // skips NULLs, so the EARLIER record's alpha element is kept and the
    // scenario survives (per-column latest-non-null semantics).
    row("2024-01-08 10:00:00", "s9", Seq(res("beta", perf = winner)),
      Some("alpha")),
    row("2024-01-08 09:00:00", "s9", Seq(res("alpha", perf = winner)),
      Some("alpha")),
    // outside the time window -> excluded by base.
    row("2025-06-01 10:00:00", "s7", Seq(res("alpha", perf = winner)),
      Some("alpha")),
    // invalid export -> excluded by base.
    row("2024-01-07 10:00:00", "s8", Seq(res("alpha", perf = winner)),
      Some("alpha"), valid = false)
  ).toDF()

  /** Shared with ReportJobSpec. */
  def viewForJob: DataFrame = view

  private val params = QueryParams("2024-01-01", "2025-01-01", "alpha")

  private def labelsFor(lender: String): Map[String, String] =
    ExportsEtl.forLender(view, params.copy(lenderName = lender))
      .select("scenarioId", "performance").as[(String, String)]
      .collect().toMap

  test("surviving scenarios and globals (steps 1-5)") {
    val out = ExportsEtl.forLender(view, params)
    // s1, s2, s6 pass; s3 (null lender), s4 ('false'), s5 ('null' cap),
    // s7 (time), s8 (invalid) do not.
    assert(out.select("scenarioId").as[String].collect().sorted.toSeq ==
      Seq("s1", "s2", "s6", "s9"))
    val globals = out.select("count_all_unique_scenario_id",
      "sum_all_total_proposed_loan_amount").distinct()
      .as[(Long, Double)].collect().toSeq
    assert(globals == Seq((4L, 500.0)))
    val perPurpose = out.select("loanPurpose", "count_all_loan_purpose")
      .distinct().as[(String, Long)].collect().toMap
    assert(perPurpose == Map("Purchase" -> 3L, "Refinance" -> 1L))
  }

  test("performance labels: every branch of exports_results.sql:150-175") {
    assert(labelsFor("alpha") == Map(
      "s1" -> "Export Winner Deals",       // exported winner
      "s2" -> "Secondary Export Deals",    // earlier alpha export serviceable
      "s6" -> "Export Winner Deals",
      "s9" -> "Not Available Scenarios"))  // latest results lack alpha -> stub
    // beta was ALSO exported for s1 at 09:00 (earlier record) and is
    // serviceable there -> the reference's Secondary rule fires before the
    // performance branches (exports_results.sql:151-163).
    assert(labelsFor("beta")("s1") == "Secondary Export Deals")
    assert(labelsFor("theta")("s6") == "Failed In Scope Deals")
    assert(labelsFor("delta") == Map(      // absent everywhere -> stub
      "s1" -> "Not Available Scenarios",
      "s2" -> "Not Available Scenarios",
      "s6" -> "Not Available Scenarios",
      "s9" -> "Not Available Scenarios"))
    assert(labelsFor("epsilon")("s6") == "Unknown")            // neither scope
    assert(labelsFor("zeta")("s6") == "Deals Not Exported")    // passed, no win
    assert(labelsFor("eta")("s6") == "Failed Out of Scope Deals")
  }

  test("dedup keeps latest record per scenario (step 2)") {
    val out = ExportsEtl.forLender(view, params)
    val s1 = out.where($"scenarioId" === "s1")
      .select("exportedLender", "time").as[(String, Timestamp)].head()
    assert(s1 == (("alpha", ts("2024-01-01 10:00:00"))))
  }

  test("forAllLenders equals the per-lender loop (single-pass parity)") {
    val all = ExportsEtl.forAllLenders(view, params.startDate, params.endDate)
    // Reference loop: one run per distinct exportedLender of the raw view.
    val lenders = Seq("alpha", "beta", "gamma")
    val looped = lenders.map(l => ExportsEtl.forLender(view, params.copy(lenderName = l)))
      .reduce(_.unionByName(_))
    val allCmp = all.drop("report_lender")
    assert(all.count() == looped.count())
    assert(allCmp.exceptAll(looped).isEmpty && looped.exceptAll(allCmp).isEmpty)
    // report_lender rides along for partitionBy writes
    assert(all.select("report_lender").distinct().as[String].collect().sorted
      .toSeq == lenders)
  }

  test("collect_list drops nulls == DuckDB list_filter(list(x), NOT NULL) (A2)") {
    import org.apache.spark.sql.functions._
    val df = Seq((1, Some("a")), (1, None), (1, Some("b")), (2, None))
      .toDF("k", "v")
    val got = df.groupBy($"k").agg(sort_array(collect_list($"v")).as("l"))
      .orderBy("k").as[(Int, Seq[String])].collect().toSeq
    assert(got == Seq((1, Seq("a", "b")), (2, Seq.empty)))
  }
}
