package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.data.{Indexing, TextAnalysis}

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

  /** TTL of an exact-dup keeper cell: content hashes idle longer than
    * this age out of state. One day is the natural crawl cadence; any
    * bound works — the contract under test is that state CANNOT grow
    * unboundedly with stream length. */
  val KeeperTtlMs: Long = 24L * 3600 * 1000

  case class FateFlags(doc_id: Long, h: String, passes_gopher: Boolean,
                       dup_tri_frac: Double, clf_score: Double,
                       contaminated: Boolean)
  case class DocFate(doc_id: Long, keeper_id: Long, fate: String)

  /** Streaming curation fate: the incrementally-decidable axes of the
    * batch `data_curation_gate` composed into ONE stream, so every
    * arriving document gets its drop/keep verdict at ingest instead of
    * in the nightly batch.
    *
    *  - The QUALITY STACK (Gopher rules, compiled duplicate-trigram
    *    repetition, hashed linear classifier) uses the batch gate's
    *    exact expressions, map-only inside the micro-batch scan.
    *  - The EXACT-DUP KEEPER is per-content-hash state: the keeper is
    *    the minimum doc_id seen so far for the hash (within one
    *    micro-batch the batch minimum wins, so a single-batch replay of
    *    the corpus reproduces the batch gate's keeper election exactly —
    *    StreamingSpec's parity law). Keeper cells age out on a
    *    [[KeeperTtlMs]] processing-time TTL, bounding state by the
    *    RECENT content universe rather than stream history.
    *  - CONTAMINATION probes each document's distinct shingles against a
    *    LITERAL Bloom bitmap of the eval suite (the bounded artifact of
    *    `data_decontaminate_bloom`) — map-only, no state, no join.
    *
    * Precedence mirrors the batch gate (dup before quality before
    * repetition before classifier), with `contaminated` LAST: it only
    * fires for documents every shared axis would keep, so per doc the
    * stream verdict either equals the gate's or is `contaminated` where
    * the gate says `kept` — the exact parity law StreamingSpec pins.
    *
    * Scale: state is one long per DISTINCT RECENT content hash (TTL'd);
    * everything else is projection work. The near-dup axis needs
    * corpus-wide LSH labels and deliberately stays batch. */
  def curationFateStream(docs: DataFrame, bloomBitmap: String, bloomK: Int,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[DocFate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.NgramFunctions.register(spark)
    import graft.functions.NgramFunctions.ngram_stats
    val gopher = TextAnalysis.gopherColumns(col("text")).toMap
    val clf = TextAnalysis.linearScoreColumns(col("text")).toMap
    val flags = docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("tri", ngram_stats(col("toks"), 3))
      .select(col("doc_id"), md5(col("text")).as("h"),
        gopher("passes_gopher").as("passes_gopher"),
        when(col("tri.total") > 0,
          col("tri.dup").cast("double") / col("tri.total").cast("double"))
          .otherwise(0.0).as("dup_tri_frac"),
        clf("score").as("clf_score"),
        exists(array_distinct(TextAnalysis.shingles(col("toks"), 3)),
          s => Indexing.bloomHitColumn(bloomBitmap, s, bloomK))
          .as("contaminated"))
      .as[FateFlags]
    // NoTimeout is the TEST configuration: with processing-time timeouts
    // armed, the default as-fast-as-possible trigger re-runs no-data
    // batches continuously (each could fire a timeout), so a test
    // harness's processAllAvailable never settles; production runs with
    // a trigger interval, where the empty timeout batches are the
    // intended eviction mechanism.
    val ttl = timeout == GroupStateTimeout.ProcessingTimeTimeout
    flags.groupByKey(_.h)
      .flatMapGroupsWithState[Long, DocFate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        timeout)(keeperFate(ttl))
  }

  /** The per-content-hash state function of [[curationFateStream]],
    * exposed for direct unit-testing of the timeout branch (via
    * `TestGroupState`). State = the hash's keeper doc_id: FIRST-SEEN
    * WINS — a remembered keeper is never re-elected by a later
    * smaller-id arrival, because the earlier verdict has already been
    * emitted and Update mode cannot retract it; re-electing would let
    * TWO copies of identical content pass the gate. Within one
    * micro-batch (no prior state) the batch minimum wins, which is what
    * makes a single-batch corpus replay reproduce the batch gate's
    * min-id election exactly. */
  private[graft] def keeperFate(ttl: Boolean)(
      h: String, rows: Iterator[FateFlags],
      state: GroupState[Long]): Iterator[DocFate] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val batch = rows.toSeq
      val keeper = state.getOption.getOrElse(batch.map(_.doc_id).min)
      state.update(keeper)
      if (ttl) state.setTimeoutDuration(KeeperTtlMs)
      batch.iterator.map { d =>
        val fate =
          if (d.doc_id != keeper) "exact_dup"
          else if (!d.passes_gopher) "quality"
          else if (d.dup_tri_frac > graft.DataQueries.RepTau) "repetitive"
          else if (d.clf_score <= 0.0) "classifier"
          else if (d.contaminated) "contaminated"
          else "kept"
        DocFate(d.doc_id, keeper, fate)
      }
    }
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
