package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Measurement probe behind the BENCH_SCALE "in-gate TFRecord mirror"
  * rows: boots a shard gate (`IndexStreams.shardIngestStream`) with the
  * wire mirror attached over an at-rest corpus of the given SF, then
  * drives THREE fixed-size micro-batches through it at the gate's
  * DEFAULT retention (1), timing each full batch cycle (parquet append
  * + mirror roll + receipt) and reporting the mirror's source-files-read
  * counter per batch — the measured form of the r15 claim that the
  * roll's delta scan is O(batch) at shipped defaults, so per-batch gate
  * cost is flat in the corpus size. Prints one JSON line. Not part of
  * the driver contract. */
object TfrGateProbe {
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
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("tfrgateprobe")
    val shards = base.resolve("shards").toString
    val tfr = base.resolve("tfr").toString

    // at-rest state: the full corpus minus the ingest slice, mirror
    // exported once — the steady-state a long-running gate sits in
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tCorpus) = timed {
      TrainQueries.writeTokenizedShards(spark, sfDir, shards,
        docWhere = Some(col("doc_id") < 400L || col("doc_id") >= 500L))
      TrainQueries.writeTfRecordShards(spark, shards, tfr)
    }

    // three fixed-size batches from the held-out slice (original-copy
    // ids only — constant batch whatever the SF)
    val slices = Seq((400L, 433L), (433L, 466L), (466L, 500L)).map {
      case (lo, hi) => Tables.documents(spark, sfDir)
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSeq
    }

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.IndexStreams.shardIngestStream(
      input.toDF().toDF("doc_id", "text"), sfDir, shards,
      base.resolve("receipts").toString, maintain = true,
      base.resolve("ckpt").toString, retainVersions = 1,
      tfrPath = Some(tfr))
    val batches = try {
      slices.map { s =>
        val before = TrainQueries.tfrSourceFilesRead.get()
        input.addData(s)
        val (_, t) = timed(q.processAllAvailable())
        (t, TrainQueries.tfrSourceFilesRead.get() - before)
      }
    } finally q.stop()

    // the mirror still equals a from-scratch export of the final state
    val fresh = base.resolve("tfr_fresh").toString
    TrainQueries.writeTfRecordShards(spark, shards, fresh)
    val a = TrainQueries.tfrFileAggregate(spark, shards, tfr).collect().toSeq
    val b = TrainQueries.tfrFileAggregate(spark, shards, fresh).collect().toSeq
    require(a == b, s"in-gate mirror != from-scratch export:\n$a\n$b")

    val bj = batches.map { case (t, f) => f"""{"sec":$t%.3f,"src_files_read":$f}""" }
    println(s"""{"probe":"tfr_gate_roll","sf":"$sfDir","corpus_build":${f"$tCorpus%.3f"},"batches":[${bj.mkString(",")}],"equal":true}""")
    spark.stop()
  }
}
