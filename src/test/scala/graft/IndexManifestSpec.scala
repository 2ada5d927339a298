package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.data.IndexManifest

/** Unit laws of the manifest layer every maintained index publishes
  * through: version monotonicity, pinned reads, orphan reconciliation,
  * and artifact versioning — the mechanics the family-level specs
  * (DataOpsSpec snapshot isolation, PartitionPruningSpec retrain)
  * exercise end to end. */
class IndexManifestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshIndex(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_manifest")
      .resolve("idx").toString
    Seq((1L, "a"), (2L, "b"), (17L, "c")).toDF("id", "v")
      .withColumn("shard", org.apache.spark.sql.functions.pmod($"id", org.apache.spark.sql.functions.lit(2)))
      .repartition($"shard")
      .write.partitionBy("shard").parquet(p)
    p
  }

  test("commit versions are monotone; load returns the highest; readData " +
      "pins exactly the committed files") {
    val p = freshIndex()
    assert(IndexManifest.load(spark, p).isEmpty)
    val files = IndexManifest.listDataFiles(spark, p)
    assert(files.nonEmpty && files.forall(_.contains("shard=")))
    val v1 = IndexManifest.commit(spark, p, files, Map.empty)
    assert(v1 == 1L)
    assert(IndexManifest.load(spark, p).get.version == 1L)
    assert(IndexManifest.readData(spark, p).count() == 3L)
    // a second commit with a SUBSET pins readers to the subset even
    // though every file is still physically present
    val v2 = IndexManifest.commit(spark, p, files.take(1), Map.empty)
    assert(v2 == 2L)
    val pinned = IndexManifest.readData(spark, p).count()
    assert(pinned < 3L, s"subset manifest must pin the subset: $pinned")
    assert(spark.read.parquet(p).count() == 3L) // directory still has all
    // no temp file may linger: the commit is write+rename (the local
    // filesystem's .crc sidecars are expected and ignored by load())
    val mdir = new java.io.File(p, "_manifests")
    assert(mdir.listFiles().forall(f => !f.getName.endsWith(".tmp")),
      "manifest temps must be renamed away")
  }

  test("reconcile deletes data files and artifact versions the manifest " +
      "does not reference, and adopts pre-manifest directories") {
    val p = freshIndex()
    // adoption: no manifest yet -> reconcile commits the listing as v1
    val snap = IndexManifest.reconcile(spark, p)
    assert(snap.version == 1L && snap.dataFiles.nonEmpty)
    // an orphan data file (crashed mutation debris)
    val shardDir = new java.io.File(p).listFiles()
      .find(_.getName.startsWith("shard=")).get
    val src = shardDir.listFiles().find(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith(".")).get
    val orphan = new java.io.File(shardDir, "compact-orphan.parquet")
    java.nio.file.Files.copy(src.toPath, orphan.toPath)
    // an orphan artifact version (written, never committed)
    IndexManifest.writeArtifact(spark, p, "model",
      Seq((0L, 1L)).toDF("k", "n"))
    assert(new java.io.File(p, "_art/model/v000001").exists())
    IndexManifest.reconcile(spark, p)
    assert(!orphan.exists(), "orphan data file must be reconciled away")
    assert(!new java.io.File(p, "_art/model/v000001").exists(),
      "uncommitted artifact version must be reconciled away")
    // a COMMITTED artifact survives reconcile; superseded versions go
    val a1 = IndexManifest.writeArtifact(spark, p, "model",
      Seq((0L, 1L)).toDF("k", "n"))
    IndexManifest.commit(spark, p,
      IndexManifest.load(spark, p).get.dataFiles, Map(a1))
    val a2 = IndexManifest.writeArtifact(spark, p, "model",
      Seq((0L, 2L)).toDF("k", "n"))
    IndexManifest.commit(spark, p,
      IndexManifest.load(spark, p).get.dataFiles, Map(a2))
    IndexManifest.reconcile(spark, p)
    assert(!new java.io.File(p, s"_art/${a1._2.split('/').last}").exists
      || !new java.io.File(p, a1._2).exists(),
      "superseded artifact version must be garbage-collected")
    assert(IndexManifest.readArtifact(spark, p, "model")
      .as[(Long, Long)].head() == (0L, 2L))
  }

  test("artifact versions increment; readArtifact falls back to a legacy " +
      "directory when no manifest pointer exists") {
    val p = freshIndex()
    IndexManifest.reconcile(spark, p)
    val a1 = IndexManifest.writeArtifact(spark, p, "df",
      Seq(("x", 1L)).toDF("term", "df"))
    val a2 = IndexManifest.writeArtifact(spark, p, "df",
      Seq(("x", 2L)).toDF("term", "df"))
    assert(a1._2.endsWith("v000001") && a2._2.endsWith("v000002"))
    // legacy fallback: a pre-manifest `_df` directory
    Seq(("legacy", 7L)).toDF("term", "df")
      .write.parquet(s"$p/_df")
    assert(IndexManifest.readArtifact(spark, p, "df",
        legacyDir = Some("_df"))
      .as[(String, Long)].head() == ("legacy", 7L))
    // once a manifest carries the pointer, the pinned version wins
    IndexManifest.commit(spark, p,
      IndexManifest.load(spark, p).get.dataFiles, Map(a2))
    assert(IndexManifest.readArtifact(spark, p, "df",
        legacyDir = Some("_df"))
      .as[(String, Long)].head() == ("x", 2L))
  }
}
