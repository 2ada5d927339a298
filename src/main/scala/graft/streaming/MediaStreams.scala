package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming twin of the image-dedup family: documents arrive as a file
  * stream, hash through the SAME fused `media_dhash` expression the batch
  * query uses (encode → decode → 56-bit perceptual hash, map-only inside
  * the micro-batch scan), and a per-hash state cell screens each image
  * against everything seen so far — the at-ingest dedup gate a training
  * pipeline runs so duplicate images never reach storage.
  *
  * Semantics: verdicts are immutable decisions — once a hash has a
  * keeper, that keeper stays (FIRST-SEEN wins across micro-batches, the
  * honest streaming contract, same as `dropDuplicatesWithinWatermark`);
  * a hash never seen before elects the minimum doc id of its micro-batch
  * (the batch election rule). Over a single-batch bounded input the
  * verdicts therefore equal the batch `data_mm_phash` output
  * row-for-row; both contracts are asserted in StreamingSpec.
  *
  * Scale: state is one long per distinct hash (bounded by distinct
  * images, 8 bytes each); a production deployment adds a TTL timeout for
  * hashes outside the dedup horizon, the same pattern as
  * [[EventStreams.RunningTotalsProcessor]].
  */
object MediaStreams {

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  case class HashedDoc(doc_id: Long, phash: Long)
  case class DedupVerdict(doc_id: Long, phash: Long, keeper_id: Long,
                          is_dup: Boolean)

  /** Incremental read of a documents parquet path (file or glob). */
  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(DocSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(path)

  /** Payload construction + fused hash over a (possibly streaming)
    * documents frame — identical expressions to the batch query. */
  def hashedImages(docs: DataFrame): Dataset[HashedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.MediaFunctions.register(spark)
    import graft.functions.MediaFunctions.media_dhash
    graft.data.Multimodal.packRealMedia(docs, "doc_id", "text")
      .select(col("doc_id"),
        media_dhash(col("payload")).as("phash"))
      .where(col("phash").isNotNull)
      .as[HashedDoc]
  }

  /** Per-image dedup verdicts against all previously-seen hashes. */
  def imageDedupStream(docs: DataFrame): Dataset[DedupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    hashedImages(docs)
      .groupByKey(_.phash)
      .flatMapGroupsWithState[Long, DedupVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (phash: Long, rows: Iterator[HashedDoc], state: GroupState[Long]) =>
          val batchRows = rows.toSeq
          // verdicts are immutable decisions: an established keeper stays
          // keeper (first-seen), only a hash never seen before elects one
          // (min doc id of the batch — the batch election rule)
          val keeper = state.getOption.getOrElse(batchRows.map(_.doc_id).min)
          state.update(keeper)
          batchRows.sortBy(_.doc_id)
            .map(r => DedupVerdict(r.doc_id, phash, keeper,
              r.doc_id != keeper)).iterator
      }
  }
}
