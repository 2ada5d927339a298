package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Measurement probe behind the BENCH_SCALE "maintained TFRecord
  * export" rows: times the at-rest wire-format lifecycle at a given SF
  * — corpus build (pinned pre-append snapshot), the APPEND roll-forward
  * (continuation files for the fixed [400,500) ingest slice), a replay,
  * and a from-scratch full export of the merged state — so the
  * append-cost-scales-with-the-batch claim is measured, not asserted.
  * Prints one JSON line. Not part of the driver contract. */
object TfrAppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale/sf0.1p")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "32MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val base = java.nio.file.Files.createTempDirectory("tfraprobe")
    val src = base.resolve("shards").toString
    // corpus shards without the ingest slice, then the parquet-side
    // batch append — the data_shard_tfrecord_append fixture shape
    val (_, tCorpus) = timed {
      TrainQueries.writeTokenizedShards(spark, sfDir, src,
        docWhere = Some(col("doc_id") < 400L || col("doc_id") >= 500L))
    }
    val batch = Tables.documentsHot(spark, sfDir)
      .where(col("doc_id") >= 400L && col("doc_id") < 500L)
    val (_, tParquetAppend) = timed {
      TrainQueries.appendTokenizedShards(spark, sfDir, batch, src)
    }
    val v1 = graft.data.IndexManifest.versions(spark, src).head
    val out = base.resolve("tfr").toString
    val (_, tBuild) = timed {
      TrainQueries.writeTfRecordShards(spark, src, out,
        srcVersion = Some(v1))
    }
    val (_, tAppend) = timed {
      TrainQueries.appendTfRecordShards(spark, src, out)
    }
    val (_, tReplay) = timed {
      TrainQueries.appendTfRecordShards(spark, src, out)
    }
    val full = base.resolve("tfr_full").toString
    val (_, tFull) = timed { TrainQueries.writeTfRecordShards(spark, src, full) }
    // the equality law, checked here too: maintained == from-scratch
    val a = TrainQueries.tfrFileAggregate(spark, src, out).collect().toSeq
    val b = TrainQueries.tfrFileAggregate(spark, src, full).collect().toSeq
    require(a == b, s"maintained != from-scratch aggregate:\n$a\n$b")
    val nFiles = graft.data.IndexManifest.load(spark, out).get.dataFiles.size
    println(f"""{"sf":"$sfDir","corpus_build":$tCorpus%.3f,""" +
      f""""parquet_append":$tParquetAppend%.3f,"tfr_build":$tBuild%.3f,""" +
      f""""tfr_append":$tAppend%.3f,"tfr_replay":$tReplay%.3f,""" +
      f""""tfr_full_export":$tFull%.3f,"files":$nFiles,"equal":true}""")
    spark.stop()
  }
}
