package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.data.IndexManifest

/** Lineage laws of the maintained-pipeline composite
  * ([[TrainQueries.pipelineLineage]] — fate gate → survivor prune →
  * tokenized shards → TFRecord mirror, every hop manifest-pinned):
  * the per-family specs prove each hop's lifecycle in isolation; this
  * one crashes BETWEEN hops while the upstream advances and proves the
  * downstream artifacts stay exactly consistent with the version they
  * pinned, then resumes and converges. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A corpus dir holding the given slice of the sf0.001 documents
    * table plus any extra (doc_id, text, source, lang) rows. */
  private def corpusDir(maxId: Long,
                        extra: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe_corpus")
      .toString
    val base = Tables.documents(spark, TestSpark.sf)
      .where(col("doc_id") < maxId)
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
    val docs =
      if (extra.isEmpty) base
      else base.unionByName(
        extra.toDF("doc_id", "text", "source", "lang"))
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def keptIds(dir: String): Set[Long] =
    DataQueries.fateTable(spark, dir).where(col("fate") === "kept")
      .select(col("doc_id")).as[Long].collect().toSet

  private def storedDocIds(shardsP: String): Set[Long] =
    IndexManifest.readData(spark, shardsP)
      .select(explode(col("doc_ids")).as("d")).as[Long].collect().toSet

  private def lineagePin(path: String): Long =
    IndexManifest.readArtifact(spark, path, "lineage").head().getLong(0)

  test("pipeline lineage: every hop pins its upstream; a crash between " +
      "the upstream advance and the downstream roll leaves downstream " +
      "consistent with the PIN; the resume converges") {
    val dirA = corpusDir(10000L, Seq.empty)
    val base = java.nio.file.Files.createTempDirectory("graft_pipe")
      .toString
    val (fateP, corpusP, shardsP, tfrP) =
      (s"$base/fate", s"$base/corpus", s"$base/shards", s"$base/tfr")

    // ---- full chain over corpus A
    TrainQueries.pipelineLineage(spark, dirA, base, vocabDir = Some(dirA))
    val keptA = keptIds(dirA)
    assert(keptA.nonEmpty, "the slice must keep some docs")
    // hop outputs and their pins
    val fateV1 = IndexManifest.load(spark, fateP).get.version
    assert(lineagePin(corpusP) == fateV1,
      "the pruned corpus must pin the fate version it read")
    val corpusV1 = IndexManifest.load(spark, corpusP).get.version
    assert(lineagePin(shardsP) == corpusV1,
      "the shards must pin the corpus version they packed")
    val shardsV1 = IndexManifest.load(spark, shardsP).get.version
    assert(IndexManifest.readArtifact(spark, tfrP, "src").head().getLong(0)
      == shardsV1, "the mirror's src artifact must pin the shard version")
    // content law: exactly the kept docs are packed, once each
    assert(storedDocIds(shardsP) == keptA)

    // ---- CRASH WINDOW: corpus B arrives (A plus new docs — donor
    // texts drawn from the sf0.01 table: same generator, so fluent in
    // the combined corpus, yet genuinely distinct, so they neither
    // near-dup against A nor flip any old doc's fate), and the chain
    // dies after hop 2: fate and corpus advance, shards and mirror
    // do not
    val textsA = Tables.documents(spark, TestSpark.sf)
      .select(col("text")).as[String].collect().toSet
    val newDocs = Tables.documents(spark, "/root/testdata/sf0.01")
      .where(col("lang").isin("de", "es", "fr")) // sample rate 1.0
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
      .as[(Long, String, String, String)].collect()
      .filter(d => !textsA.contains(d._2))
      .take(12).zipWithIndex
      .map { case ((_, t, s, l), i) => (9000L + i, t, s, l) }.toSeq
    val dirB = corpusDir(10000L, newDocs)
    TrainQueries.pipelineLineage(spark, dirB, base,
      vocabDir = Some(dirA), through = 2)
    val corpusV2 = IndexManifest.load(spark, corpusP).get.version
    assert(corpusV2 > corpusV1, "the upstream must have advanced")
    // downstream is STALE but CONSISTENT with its pin:
    assert(lineagePin(shardsP) == corpusV1,
      "the crashed chain must leave the shards on their old pin")
    // the pinned corpus version is still retained and still holds
    // exactly the kept-A corpus the shards were packed from
    val pinnedCorpus = IndexManifest.readDataAt(spark, corpusP, corpusV1)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(pinnedCorpus == keptA)
    assert(storedDocIds(shardsP) == keptA,
      "the stored shards must equal the pinned corpus, not the new one")
    // the artifact-vs-recompute law holds on the stale shards, and the
    // stale mirror still equals a from-scratch export of those shards
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("shard")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows(TrainQueries.readShardManifest(spark, shardsP)) ==
      rows(TrainQueries.shardTokenManifest(spark, shardsP)))
    val freshExport = s"$base/tfr_check"
    TrainQueries.writeTfRecordShards(spark, shardsP, freshExport)
    assert(TrainQueries.tfrFileAggregate(spark, shardsP, tfrP)
        .collect().toSeq ==
      TrainQueries.tfrFileAggregate(spark, shardsP, freshExport)
        .collect().toSeq,
      "the stale mirror must still equal a from-scratch export")

    // ---- RESUME: the next full run rolls every hop forward
    TrainQueries.pipelineLineage(spark, dirB, base, vocabDir = Some(dirA))
    val keptB = keptIds(dirB)
    assert((keptB -- keptA).nonEmpty,
      "corpus B must keep at least one new doc for the resume to roll: " +
        DataQueries.fateTable(spark, dirB)
          .where(col("doc_id") >= 9000L)
          .select(col("doc_id"), col("fate"), col("score"),
            col("avg_logcount"), col("source_blocked"))
          .collect().mkString("; "))
    assert(storedDocIds(shardsP) == keptB,
      "after the resume the shards hold exactly the new kept set")
    assert(lineagePin(shardsP) ==
      IndexManifest.load(spark, corpusP).get.version)
    assert(IndexManifest.readArtifact(spark, tfrP, "src").head().getLong(0)
      == IndexManifest.load(spark, shardsP).get.version)
    assert(rows(TrainQueries.readShardManifest(spark, shardsP)) ==
      rows(TrainQueries.shardTokenManifest(spark, shardsP)))
    // the rolled mirror equals a from-scratch export of the NEW state —
    // and every at-rest record roundtrips
    val freshExport2 = s"$base/tfr_check2"
    TrainQueries.writeTfRecordShards(spark, shardsP, freshExport2)
    val agg = TrainQueries.tfrFileAggregate(spark, shardsP, tfrP)
      .collect().toSeq
    assert(agg == TrainQueries.tfrFileAggregate(spark, shardsP, freshExport2)
      .collect().toSeq)
    assert(agg.forall(r => r.getLong(1) == r.getLong(4)),
      s"every record must roundtrip after the resume: $agg")
  }

  test("pipeline lineage: a crash between hop 3 and hop 4 leaves the " +
      "mirror stale but consistent with ITS pin (the src artifact's " +
      "shard version), and the pinned-pairing serve stays exact") {
    // 460, not a smaller slice: the fate gate's corpus-global fluency
    // bar collapses the kept set nonlinearly on a shrunken corpus
    val dirA = corpusDir(460L, Seq.empty)
    val dirB = corpusDir(10000L, Seq.empty)
    val base = java.nio.file.Files.createTempDirectory("graft_pipe34")
      .toString
    val (shardsP, tfrP) = (s"$base/shards", s"$base/tfr")

    // full chain over the slice, then the grown corpus's chain dies
    // AFTER the shards rolled but BEFORE the mirror did (through = 3);
    // retention 4 keeps the mirror's pinned shard version readable
    // through the second run's two shard-side commits
    TrainQueries.pipelineLineage(spark, dirA, base, vocabDir = Some(dirB),
      retainVersions = 4)
    val keptA = keptIds(dirA)
    assert(keptA.nonEmpty)
    TrainQueries.pipelineLineage(spark, dirB, base, vocabDir = Some(dirB),
      through = 3, retainVersions = 4)
    val keptB = keptIds(dirB)
    assert((keptB -- keptA).nonEmpty, "the grown corpus must add docs")
    assert(storedDocIds(shardsP) == (keptA ++ keptB),
      "the crashed run advanced the shards")

    // the mirror is STALE (its src pin predates the shard roll) but the
    // PAIRED serve — mirror files at its version, expected frames at
    // the shard version its own src artifact names — is still exact on
    // every record
    val srcPin = IndexManifest.readArtifact(spark, tfrP, "src")
      .head().getLong(0)
    assert(srcPin < IndexManifest.load(spark, shardsP).get.version,
      "the mirror must be behind the shards in the crash window")
    val paired = TrainQueries.tfrFileAggregateAt(spark, shardsP,
      Some(srcPin), tfrP, None).collect().toSeq
    assert(paired.nonEmpty &&
      paired.forall(r => r.getLong(1) == r.getLong(3) &&
        r.getLong(1) == r.getLong(4)),
      s"the pinned-pairing serve must roundtrip every record: $paired")
    // the stale mirror does NOT cover the advanced shard state: it has
    // no records for the continuation bins run 2 added, so its record
    // count falls short of the current bin count — the under-coverage
    // the src pin exists to make explicit
    val binsNow = TrainQueries.readShardManifest(spark, shardsP)
      .agg(sum(col("n_seqs"))).head().getLong(0)
    val unpaired = TrainQueries.tfrFileAggregate(spark, shardsP, tfrP)
      .collect().toSeq
    assert(unpaired.map(_.getLong(1)).sum < binsNow,
      "the stale mirror must NOT fully cover the advanced shards")

    // resume: the next full run rolls the mirror; pins re-align
    TrainQueries.pipelineLineage(spark, dirB, base, vocabDir = Some(dirB),
      retainVersions = 4)
    assert(IndexManifest.readArtifact(spark, tfrP, "src").head().getLong(0)
      == IndexManifest.load(spark, shardsP).get.version)
    val fresh = s"$base/tfr_fresh"
    TrainQueries.writeTfRecordShards(spark, shardsP, fresh)
    assert(TrainQueries.tfrFileAggregate(spark, shardsP, tfrP)
        .collect().toSeq ==
      TrainQueries.tfrFileAggregate(spark, shardsP, fresh).collect().toSeq,
      "after the resume the mirror equals a from-scratch export")
  }
}
