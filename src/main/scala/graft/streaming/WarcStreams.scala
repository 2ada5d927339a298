package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming WARC ingest: crawl containers arrive as a stream (each row
  * one WARC file's contents), split into records by the SAME compiled
  * Content-Length parser the batch round-trip uses — map-only inside the
  * micro-batch scan — and every record passes an at-ingest exact-dedup gate
  * against everything seen so far, so a payload re-crawled into a later
  * WARC file never reaches storage twice.
  *
  * Semantics match [[MediaStreams]]: verdicts are immutable first-seen
  * decisions — once a payload hash has a keeper it stays keeper across
  * micro-batches; a hash never seen before elects the minimum record id
  * of its batch (the batch election rule), so a single-batch bounded run
  * equals the batch exact-dedup election row-for-row (StreamingSpec).
  *
  * A malformed container parses to null and simply contributes no
  * records (the explode drops it) — dirty crawl data never kills the
  * stream; the batch quarantine pattern applies upstream if the rejects
  * must be kept.
  *
  * Scale: state is one long per distinct payload hash; parsing and
  * hashing are projections. A production gate adds a TTL for hashes
  * outside the dedup horizon ([[EventStreams.RunningTotalsProcessor]]).
  */
object WarcStreams {

  case class WarcRec(rec_id: Long, body_md5: String)
  case class IngestVerdict(rec_id: Long, body_md5: String, keeper_id: Long,
                           is_dup: Boolean)

  /** Container stream/frame (column `container`) → parsed record rows —
    * identical expressions to the batch `data_warc_roundtrip` parse. */
  def parsedRecords(containers: DataFrame): DataFrame = {
    val spark = containers.sparkSession
    graft.functions.WarcFunctions.register(spark)
    import graft.functions.WarcFunctions.warc_records
    containers
      .select(explode(warc_records(col("container"))).as("r"))
      .select(col("r.rec_id").as("rec_id"),
        col("r.offset").as("offset"),
        col("r.content_length").as("content_length"),
        md5(col("r.payload")).as("body_md5"))
  }

  /** Per-record dedup verdicts against all previously-ingested payloads. */
  def ingestDedupStream(containers: DataFrame): Dataset[IngestVerdict] = {
    val spark = containers.sparkSession
    import spark.implicits._
    parsedRecords(containers)
      .select(col("rec_id"), col("body_md5"))
      .as[WarcRec]
      .groupByKey(_.body_md5)
      .flatMapGroupsWithState[Long, IngestVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (h: String, rows: Iterator[WarcRec], state: GroupState[Long]) =>
          val batchRows = rows.toSeq
          val keeper = state.getOption.getOrElse(batchRows.map(_.rec_id).min)
          state.update(keeper)
          batchRows.sortBy(_.rec_id)
            .map(r => IngestVerdict(r.rec_id, h, keeper,
              r.rec_id != keeper)).iterator
      }
  }
}
