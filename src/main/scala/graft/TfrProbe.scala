package graft

import org.apache.spark.sql.SparkSession

/** Debug/decomposition probe for the TFRecord files-at-rest path: builds
  * the tokenized-shard artifact at a given SF, writes the `.tfrecord`
  * files, and prints the intermediate counts (source rows, shard dirs,
  * file bytes) — isolates where an empty artifact would come from. Not
  * part of the driver contract. */
object TfrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale/sf0.1p")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("tfrprobe")
    val src = base.resolve("shards").toString
    TrainQueries.writeTokenizedShards(spark, sfDir, src)
    println(s"[tfrprobe] src rows: " +
      graft.data.IndexManifest.readData(spark, src).count())
    val out = base.resolve("tfr").toString
    TrainQueries.writeTfRecordShards(spark, src, out)
    val dirs = new java.io.File(out).listFiles().toSeq
      .filter(_.getName.startsWith("shard="))
    println(s"[tfrprobe] out dirs: ${dirs.size}  files: " +
      dirs.flatMap(_.listFiles().toSeq).map(f =>
        s"${f.getName}:${f.length()}").mkString(", "))
    println(s"[tfrprobe] manifest files: " +
      graft.data.IndexManifest.load(spark, out).map(_.dataFiles.size))
    spark.stop()
  }
}
