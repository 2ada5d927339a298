package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage decomposition of the fused JPEG RGB roundtrip
  * (`data_mm_jpeg_rgb_decode`) — backs the BENCH_SCALE.md breakdown of
  * where the query's time goes: the DuckDB twin of this query does NO
  * codec work (it derives geometry from text length and emits literal
  * booleans), so the honest ratio question is how much of the Spark
  * time is the real ImageIO encode/decode the twin skips versus
  * plan/fold work it also does. Cumulative phases, each warm
  * best-of-3 noop writes over the same corpus:
  *
  *   pixels  — compiled text→packed-0xRRGGBB build only
  *   encode  — + ImageIO baseline-JPEG encode (payload length forced)
  *   decode  — + ImageIO decode (pixel count forced)
  *   full    — the fused roundtrip expression incl. tolerance folds
  *
  * Not part of the driver contract. */
object JpegDecompProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.JpegFunctions.register(spark)
    graft.functions.TextPixelFunctions.register(spark)
    import graft.functions.JpegFunctions.{jpeg_encode_rgb, jpeg_roundtrip_rgb, media_decode_jpeg_rgb}
    import graft.functions.TextPixelFunctions.text_rgb_pixels

    val W = MediaQueries.W
    def base: DataFrame = Tables.documents(spark, sfDir)
      .where(col("text").isNotNull && length(col("text")) >= W)
    val px = text_rgb_pixels(col("text"), 64, W)

    def time(df: DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm caches/codegen
      (1 to 3).map(_ => once()).min
    }

    val only = sys.env.get("JPEG_PROBE_PHASES")
      .map(_.split(",").map(_.trim).toSet)
    val phases = Seq(
      "pixels" -> base.select(col("doc_id"), size(px).as("n")),
      "encode" -> base.select(col("doc_id"),
        length(jpeg_encode_rgb(px, W, MediaQueries.JpegQuality)).as("n")),
      "decode" -> base.select(col("doc_id"),
        size(media_decode_jpeg_rgb(
          jpeg_encode_rgb(px, W, MediaQueries.JpegQuality))
          .getField("pixels")).as("n")),
      "full" -> base.select(col("doc_id"), jpeg_roundtrip_rgb(
        px, W, MediaQueries.JpegQuality,
        MediaQueries.JpegRgbLumaTol, MediaQueries.JpegRgbMeanTol).as("m")),
      "query" -> Registry.byName("data_mm_jpeg_rgb_decode").build(spark, sfDir)
    ).filter(p => only.forall(_.contains(p._1)))
    val times = phases.map { case (name, df) => name -> time(df) }
    val parts = times.map { case (n, t) => f""""$n":$t%.3f""" }
    println(s"""{"probe":"jpeg_rgb_decomp","sf":"$sfDir",${parts.mkString(",")}}""")
    spark.stop()
  }
}
