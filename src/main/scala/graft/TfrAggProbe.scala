package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition probe for the TFRecord file-level aggregate: isolates
  * the records side (binaryFile scan + split + parse + digest), the
  * stored side (expected-frame recompute + digest + rank window), and
  * the full join+aggregate, over both query fixtures (the full-corpus
  * artifact and the build+append artifact) — pins where the
  * at-scale time goes. Not part of the driver contract. */
object TfrAggProbe {
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
    graft.functions.TfRecordFunctions.register(spark)
    import graft.functions.TfRecordFunctions.{tfrecord_frame, tfrecord_parse, tfrecord_split}
    // noop WRITES, not count(): count() lets the optimizer prune every
    // computed column (digests, parses, frames), measuring an empty plan
    def timed(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val base = java.nio.file.Files.createTempDirectory("tfraggprobe")
    val src = base.resolve("shards").toString
    TrainQueries.writeTokenizedShards(spark, sfDir, src)
    val out = base.resolve("tfr").toString
    TrainQueries.writeTfRecordShards(spark, src, out)
    val tfrFiles = graft.data.IndexManifest.load(spark, out).get.dataFiles
    val root = new org.apache.hadoop.fs.Path(out)
    def recordsSide() = spark.read.format("binaryFile")
      .load(tfrFiles.map(f => new org.apache.hadoop.fs.Path(root, f).toString): _*)
      .select(posexplode(tfrecord_split(col("content"))).as(Seq("pos", "framed")))
      .select(length(col("framed")).as("nb"), md5(col("framed")).as("m"),
        tfrecord_parse(col("framed")).getField("data_crc_ok").as("ok"))
    def storedSide() = graft.data.IndexManifest.readData(spark, src)
      .select(col("shard").cast("long").as("shard"),
        col("bin").cast("long").as("bin"),
        tfrecord_frame(col("token_ids")).as("exp"))
      .select(col("shard"), col("bin"), md5(col("exp")).as("m"),
        length(col("exp")).as("nb"))
    (1 to 2).foreach { rep =>
      val t1 = timed(recordsSide())
      val t2 = timed(storedSide())
      val t3 = timed(TrainQueries.tfrFileAggregate(spark, src, out))
      println(f"""{"rep":$rep,"records_s":$t1%.3f,""" +
        f""""stored_s":$t2%.3f,"full_s":$t3%.3f}""")
    }
    spark.stop()
  }
}
