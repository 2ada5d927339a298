package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ReportJob
import graft.operators.Skew

/** End-to-end report job over the golden fixture + skew operators. */
class ReportJobSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ReportJob writes per-lender BOM'd CSVs and a consolidated merge") {
    val fixture = new ExportsEtlSpec
    val tmp = Files.createTempDirectory("graft_report").toString
    val merged = ReportJob.run(fixture.viewForJob, "2024-01-01", "2025-01-01",
      s"$tmp/output", s"$tmp/result")

    // _quarantine is always written (empty here) — lender dirs are the rest
    val lenderDirs = new java.io.File(s"$tmp/output").listFiles()
      .filter(d => d.isDirectory && !d.getName.startsWith("_"))
      .map(_.getName).sorted
    assert(lenderDirs.toSeq ==
      Seq("report_lender=alpha", "report_lender=beta", "report_lender=gamma"))

    // every per-lender part file carries the BOM
    lenderDirs.foreach { d =>
      val part = new java.io.File(s"$tmp/output/$d").listFiles()
        .filter(_.getName.startsWith("part-")).head
      val head = Files.readAllBytes(part.toPath).take(3).toSeq
      assert(head == Seq(0xEF.toByte, 0xBB.toByte, 0xBF.toByte), d)
    }

    // the write input is hash-partitioned on report_lender (parallel per
    // lender at scale) — not collapsed to a single partition. AQE may
    // coalesce the toy fixture's shuffle at runtime, so assert the PLAN:
    // a repartition-by-expression on report_lender, and no Repartition(1).
    val writePlan = ReportJob
      .partitionedForWrite(graft.etl.ExportsEtl
        .forAllLenders(fixture.viewForJob, "2024-01-01", "2025-01-01"))
      .queryExecution.optimizedPlan
    val repartitions = writePlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
    }
    assert(repartitions.exists(_.partitionExpressions.exists(
      _.references.map(_.name).toSeq == Seq("report_lender"))),
      s"write input not partitioned by report_lender:\n$writePlan")
    assert(!writePlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r.numPartitions
    }.contains(1), "write input collapsed to one partition")

    // merged row count equals the all-lenders report row count
    val expected = graft.etl.ExportsEtl
      .forAllLenders(fixture.viewForJob, "2024-01-01", "2025-01-01").count()
    assert(merged.count() == expected)
    // merge read-back is all-string with the 22 report columns (lender
    // partition column excluded from file contents, like the reference)
    assert(merged.columns.length == 22)
  }

  test("poison rows land in _quarantine; every other lender file still written") {
    val fixture = new ExportsEtlSpec
    // A malformed-results row (truncated JSON): from_json yields NULL, so
    // without the quarantine split it would silently reclassify the
    // scenario; with it, the ROW is side-carted and the job completes.
    val poison = Seq((java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
        "sPOISON", """[{"lenderName":"alpha","doesService":""", "alpha"))
      .toDF("time", "scenarioId", "results", "exportedLender")
    val poisoned = fixture.viewForJob.unionByName(poison, allowMissingColumns = true)

    val tmp = Files.createTempDirectory("graft_quarantine").toString
    val merged = ReportJob.run(poisoned, "2024-01-01", "2025-01-01",
      s"$tmp/output", s"$tmp/result")

    // the poison row — and only it — is in the quarantine side-cart
    val q = spark.read.parquet(s"$tmp/output/_quarantine")
    assert(q.select("scenarioId").as[String].collect().toSeq == Seq("sPOISON"))

    // all lender reports written, none corrupted by the BOM pass
    val lenderDirs = new java.io.File(s"$tmp/output").listFiles()
      .filter(d => d.isDirectory && !d.getName.startsWith("_"))
      .map(_.getName).sorted
    assert(lenderDirs.toSeq ==
      Seq("report_lender=alpha", "report_lender=beta", "report_lender=gamma"))

    // the report equals the clean-fixture report: the poison row changed
    // nothing downstream
    val expected = graft.etl.ExportsEtl
      .forAllLenders(fixture.viewForJob, "2024-01-01", "2025-01-01").count()
    assert(merged.count() == expected)
  }

  test("saltedCounts equals plain groupBy count") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("k", "v")
    val plain = df.groupBy($"k").count().orderBy("k")
      .as[(String, Long)].collect().toSeq
    val salted = Skew.saltedCounts(df, "k", Seq("k", "v"), 8)
      .orderBy("k").as[(String, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val big = (1 to 500).map(i => (s"k${i % 7}", i)).toDF("k", "v")
    val small = (0 to 6).map(i => (s"k$i", s"dim$i")).toDF("k", "d")
    val plain = big.join(small, Seq("k")).orderBy("k", "v")
      .as[(String, Int, String)].collect().toSeq
    val salted = Skew.saltedJoin(big, small, "k", 4).orderBy("k", "v")
      .as[(String, Int, String)].collect().toSeq
    assert(salted == plain)
  }
}
