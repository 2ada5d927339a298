package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** The reference's monthly report (run_exports_query.py + exports_results
  * .sql) as a CONTINUOUSLY-REFRESHED streaming job: micro-batches of
  * exports-view rows append to an ingest table, and `foreachBatch`
  * re-runs the SAME single-pass [[graft.etl.ExportsEtl.forAllLenders]]
  * plan over the accumulated table — incremental INGEST plus full-refresh
  * REPORT, sharing one code path with the batch job.
  *
  * Why full refresh, not an incremental report: the report's semantics
  * are whole-input aggregates — argmax-latest over all history, global
  * `COUNT(DISTINCT)`s, a per-lender fan-out of every surviving scenario —
  * so any "incremental" variant either holds the entire deduped state in
  * the stream (same cost, more machinery) or approximates the globals.
  * Refreshing from the materialized ingest table per trigger is the
  * honest production shape, and the refresh is the already-audited
  * single-pass plan (one scan of the ingest table per trigger, however
  * many lenders).
  *
  * Delivery contract: the file-source checkpoint makes ingest
  * exactly-once (each source file appends exactly once across restarts),
  * and the report overwrite is idempotent, so a crash between append and
  * report write costs at most one stale refresh. The checkpoint lives
  * under `<ingestDir>/_checkpoint` — an `_`-prefixed dir, invisible to
  * the parquet re-read.
  */
object ReportRefresh {

  def start(viewStream: DataFrame, ingestDir: String,
            startDate: String, endDate: String,
            reportDir: String): StreamingQuery =
    viewStream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$ingestDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.write.mode("append").parquet(ingestDir)
        val full = batch.sparkSession.read.parquet(ingestDir)
        graft.etl.ExportsEtl.forAllLenders(full, startDate, endDate)
          .write.mode("overwrite").parquet(reportDir)
      }
      .start()
}
