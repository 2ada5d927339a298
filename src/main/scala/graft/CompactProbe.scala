package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.Dedup

/** Measured row for the index-compaction operator: builds the corpus
  * cell index at a scale directory, drives N micro-batch appends into it
  * (each append = new parquet files in every touched shard directory),
  * and reports file count, serve-side scan tasks, and serve wall time
  * BEFORE vs AFTER [[graft.data.Dedup.compactIndex]] — plus the
  * serve-results-identical check. Not part of the driver contract.
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale/sf1")
    val appends = args.lift(1).map(_.toInt).getOrElse(24)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_probe")
      .resolve("cells").toString
    Dedup.writeCellIndex(docs.where(col("doc_id") >= 1000), "doc_id", "text",
      4, dir)

    // N appends, each a distinct 40-doc window: every append writes new
    // files into the shard directories its novel cells hash to
    (0 until appends).foreach { i =>
      val lo = i * 40L
      val batch = docs.where(col("doc_id") >= lo && col("doc_id") < lo + 40)
      Dedup.appendCellIndex(
        Dedup.cellHashes(batch, "doc_id", "text", 4), dir)
    }

    val screenBatch = Dedup.cellHashes(
      docs.where(col("doc_id") >= 0 && col("doc_id") < 100),
      "doc_id", "text", 4).localCheckpoint(true)

    def files(): Int = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(d =>
        d.listFiles().count(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))).sum
    def serve() = Dedup.indexedCellScreen(
      screenBatch, spark.read.parquet(dir), "doc_id")
    def scanTasks(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("graft_compact_probe")) =>
          f.inputRDDs().head.getNumPartitions
      }.getOrElse(-1)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val before = serve()
    before.count() // warm
    val tBefore = (1 to 3).map(_ => time(before.count(): Unit)).min
    val rowsBefore = before.orderBy("doc_id").collect().toSeq
    val filesBefore = files(); val tasksBefore = scanTasks(before)

    val tCompact = time {
      val (n, fb, fa) = Dedup.compactIndex(spark, dir, maxFilesPerShard = 1)
      println(s"[compactprobe] compacted $n shards: $fb -> $fa files")
    }

    val after = serve()
    after.count()
    val tAfter = (1 to 3).map(_ => time(after.count(): Unit)).min
    val rowsAfter = after.orderBy("doc_id").collect().toSeq
    val filesAfter = files(); val tasksAfter = scanTasks(after)

    println(s"[compactprobe] identical=${rowsBefore == rowsAfter} " +
      s"appends=$appends files $filesBefore -> $filesAfter, " +
      s"scan_tasks $tasksBefore -> $tasksAfter, " +
      f"serve $tBefore%.3f -> $tAfter%.3f s, compact $tCompact%.3f s")
    spark.stop()
  }
}
