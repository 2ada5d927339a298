package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.data.TextAnalysis

/** Streaming twin of the source-reputation gate
  * (`data_source_reputation`'s quality axis): documents arrive as a
  * stream, score through the SAME quality expression the batch query
  * uses (map-only inside the micro-batch scan), and a per-source state
  * cell accumulates exact evidence — doc count and the micro-unit
  * quantized quality sum, the same no-float-accumulation contract as
  * the batch mean. Each batch re-emits the updated verdict for every
  * source it touched, so a crawl scheduler can drop a content farm
  * MID-CRAWL instead of discovering it in the nightly batch.
  *
  * Verdict semantics: a source is blocked once it has at least
  * [[CurationStreams.MinEvidence]] documents AND its running mean falls
  * under the batch gate's quality floor. The verdict is RE-EVALUATED
  * per batch (unlike the image gate's immutable keepers) — reputation
  * is evidence, not identity, and a source can redeem itself; the spec
  * pins both the flip-on and flip-off transitions.
  *
  * Scale: state is (long, long) per SOURCE — domains, not documents —
  * so it is bounded by the provenance universe; no TTL is needed at any
  * corpus size (the crawl's domain list is the small dimension). The
  * near-dup axis of the batch gate needs corpus-wide LSH labels and
  * deliberately stays batch; this stream is the quality axis that CAN
  * be decided incrementally.
  */
object CurationStreams {

  /** Minimum documents before a block verdict may fire — a one-doc
    * source is never judged. */
  val MinEvidence = 10L

  /** Quality floor in micro-units — the batch gate's RepQualMinQ6. */
  val QualFloorQ6 = 1000000.0

  case class DocQ(doc_id: Long, source: String, q6: Long)
  case class SourceStats(source: String, n_docs: Long, sum_q6: Long,
                         mean_q6: Double, is_blocked: Boolean)

  /** Per-doc quantized quality over a (possibly streaming) documents
    * frame — identical expressions to the batch query. */
  def qualityDocs(docs: DataFrame): Dataset[DocQ] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val score = TextAnalysis.qualityColumns(col("text")).toMap
      .apply("quality_score")
    docs.select(col("doc_id"), col("source"),
        round(score * 1e6).cast("long").as("q6"))
      .as[DocQ]
  }

  /** Running per-source reputation; emits the updated verdict for every
    * source touched by the batch (Update output mode). */
  def sourceReputationStream(docs: DataFrame): Dataset[SourceStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    qualityDocs(docs)
      .groupByKey(_.source)
      .mapGroupsWithState[(Long, Long), SourceStats](
        GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocQ],
         state: GroupState[(Long, Long)]) =>
          var (n, s) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { r => n += 1; s += r.q6 }
          state.update((n, s))
          val mean = s.toDouble / n
          SourceStats(source, n, s, mean,
            n >= MinEvidence && mean < QualFloorQ6)
      }
  }
}
