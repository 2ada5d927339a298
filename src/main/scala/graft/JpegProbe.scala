package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.Multimodal

/** Tolerance-band measurement for the JPEG query (the fixed bands its
  * booleans embed must hold corpus-wide at every SF): prints the maximum
  * per-pixel absolute error and per-doc mean drift of the
  * encode→decode roundtrip over a testdata directory. Not part of the
  * driver contract.
  */
object JpegProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val quality = args.lift(1).map(_.toInt).getOrElse(90)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.JpegFunctions.register(spark)
    import graft.functions.JpegFunctions._
    val W = Multimodal.BmpWidth
    val px = Multimodal.fullRowPixels(col("text"))
    val df = Tables.documents(spark, sfDir)
      .where(col("text").isNotNull && length(col("text")) >= W)
      .select(col("doc_id"), px.as("px"))
      .select(col("doc_id"), col("px"),
        jpeg_encode_gray(col("px"), W, quality).as("payload"))
      .select(col("doc_id"), col("px"),
        media_decode_jpeg(col("payload")).getField("pixels").as("dec"))
      .select(col("doc_id"),
        aggregate(zip_with(col("dec"), col("px"),
          (d, s) => abs(d - s)), lit(0), (a, x) => greatest(a, x))
          .as("max_err"),
        abs(aggregate(col("dec"), lit(0L), (a, x) => a + x).cast("double")
            / size(col("dec"))
          - aggregate(col("px"), lit(0L), (a, x) => a + x).cast("double")
            / size(col("px"))).as("mean_drift"))
    val row = df.agg(max(col("max_err")), max(col("mean_drift")),
      count(lit(1))).head()
    if (row.getLong(2) == 0L) println("[jpegprobe] docs=0 (nothing to measure)")
    else println(s"[jpegprobe] q=$quality max_pixel_err=${row.get(0)} " +
      f"max_mean_drift=${row.getDouble(1)}%.3f docs=${row.getLong(2)}")
    spark.stop()
  }
}
