package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with a typed metadata struct; decode/feature-extraction runs
  * over the bytes inside the scan.
  *
  * The REAL decode path is [[graft.functions.MediaCodecImpl]]: a pure-JVM
  * parse of two actual container formats — RIFF/WAVE PCM16 (chunk-list
  * walk, `fmt ` validation, signed-LE samples) and 8-bit BMP
  * (BITMAPINFOHEADER, palette offset, 4-byte row stride, bottom-up rows)
  * — surfaced here as [[packRealMedia]] (tabular → container bytes) and
  * [[decodeFeatures]] (bytes → integer-domain feature struct). Exotic
  * codecs (JPEG/PNG/MP4) would slot into the same `media_decode`
  * expression with a JNI/ONNX call; [[decodeFeaturesStub]] remains as the
  * honest codec-unavailable fallback showing that batched-typed shape.
  */
object Multimodal {

  /** Payload + typed metadata. In production the payload would come off a
    * binary-file source (`spark.read.format("binaryFile")`) or a bytes
    * column in parquet; here text bytes stand in. */
  def packMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast("binary").as("payload"),
      struct(
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        when(col(idCol) % 3 === 0, "png")
          .when(col(idCol) % 3 === 1, "jpeg")
          .otherwise("wav").as("format"),
        (col(idCol) % 640).cast("int").as("width"),
        (col(idCol) % 480).cast("int").as("height")).as("meta"))

  val FeatureDim = 4

  /** STUB decode → fixed-width feature vector. Deterministic: feature i is
    * payload byte i scaled to [0,1) (0.0 past the end). Runs as a typed
    * per-partition map — the same execution shape as a real batched codec
    * call — and returns (id, f0..f3). */
  def decodeFeaturesStub(media: DataFrame, idCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col(idCol), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // One iterator pass per partition: a real decoder would batch
        // `bytes` through the codec here.
        it.map { case (id, bytes) =>
          val f = Array.tabulate(FeatureDim) { i =>
            if (bytes != null && i < bytes.length) (bytes(i) & 0xFF) / 255.0 else 0.0
          }
          (id, f(0), f(1), f(2), f(3))
        }
      }
    out.toDF(idCol, "f0", "f1", "f2", "f3")
  }

  /** Character-code array of the first `maxN` chars of `text` — the
    * deterministic tabular source both the encoders and the SQL oracle
    * derive from (ASCII code points; both engines' `ascii` agree). */
  def textCodes(text: Column, maxN: Int): Column = {
    val n = least(length(text), lit(maxN))
    when(n >= 1, transform(sequence(lit(1), n), i => ascii(text.substr(i, lit(1)))))
      .otherwise(array().cast("array<int>"))
  }

  val WavRate = 8000
  val BmpWidth = 7 // deliberately not a multiple of 4: exercises row padding

  /** Gray pixel stream of a text row — character codes mod 256. The ONE
    * Scala-side source of the image-pixel convention (the oracles'
    * shared `pixCtes` is its SQL twin); every image packer
    * ([[packRealMedia]], the PGM and reel queries) derives from here so
    * a code-mapping change cannot desynchronize them. */
  def grayPixels(text: Column, maxN: Int = 64): Column =
    transform(textCodes(text, maxN), c => pmod(c, lit(256)))

  /** [[grayPixels]] truncated to full [[BmpWidth]] rows — the encoders'
    * `height = n / width` tail-drop rule, applied up front. Routes
    * through the compiled one-pass [[graft.functions.TextGrayPixels]]
    * (this projection runs on every image-query scan; the interpreted
    * ascii/transform chain was the JPEG query's measured hot spot —
    * 2.3 of 3.6 s at sf10); [[fullRowPixelsHof]] is the semantic
    * definition and parity reference. */
  def fullRowPixels(text: Column, maxN: Int = 64): Column = {
    graft.functions.TextPixelFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    graft.functions.TextPixelFunctions.text_gray_pixels(text, maxN, BmpWidth)
  }

  /** Composable-HOF form of [[fullRowPixels]] — kept as the parity
    * reference (MediaProps asserts bit-identical output). */
  def fullRowPixelsHof(text: Column, maxN: Int = 64): Column = {
    val p = grayPixels(text, maxN)
    slice(p, lit(1), floor(size(p) / BmpWidth).cast("int") * BmpWidth)
  }

  /** Build REAL container payloads from the text column: even ids → a
    * RIFF/WAVE PCM16 file of `(code % 128 - 64) * 256` samples, odd ids →
    * an 8-bit BMP of `code % 256` pixels at [[BmpWidth]] (tail chars past
    * the last full row dropped), and every `id % 10 == 3` → the RAW text
    * bytes (no container) to exercise the decoder's format sniffing.
    * Map-only codegen'd expressions — at 100 TB this is a projection on
    * the scan, no shuffle. */
  def packRealMedia(df: DataFrame, idCol: String, textCol: String,
                    maxN: Int = 64): DataFrame = {
    graft.functions.MediaFunctions.register(df.sparkSession)
    import graft.functions.MediaFunctions.{bmp_encode, wav_encode}
    val codes = textCodes(col(textCol), maxN)
    val samples = transform(codes, c => (pmod(c, lit(128)) - 64) * 256)
    val fullRows = fullRowPixels(col(textCol), maxN)
    df.select(col(idCol),
      // NULL text → NULL payload, pinned EXPLICITLY: the branch
      // expressions disagree on null (textCodes' least() null-skip
      // yields maxN null codes on the WAV side; the compiled pixel
      // build yields the empty array on the BMP side), so without this
      // guard the null behavior would depend on doc_id parity
      when(col(textCol).isNull, lit(null).cast("binary"))
        .when(col(idCol) % 10 === 3, col(textCol).cast("binary"))
        .when(col(idCol) % 2 === 0, wav_encode(samples, WavRate))
        .otherwise(bmp_encode(fullRows, BmpWidth)).as("payload"))
  }

  /** Decode `payload` into the integer-domain feature struct
    * ([[graft.functions.MediaCodecImpl.Schema]]), flattened to columns.
    * Unknown/corrupt payloads yield (format, valid=false, zero counts)
    * rather than failing the scan — the production contract for dirty
    * multimodal corpora. */
  def decodeFeatures(media: DataFrame, idCol: String): DataFrame = {
    graft.functions.MediaFunctions.register(media.sparkSession)
    import graft.functions.MediaFunctions.media_decode
    media.select(col(idCol), media_decode(col("payload")).as("m"))
      .select(col(idCol), col("m.format").as("format"),
        col("m.valid").as("valid"), col("m.width").as("width"),
        col("m.height").as("height"), col("m.sample_rate").as("sample_rate"),
        col("m.n_values").as("n_values"), col("m.sum_val").as("sum_val"),
        col("m.min_val").as("min_val"), col("m.max_val").as("max_val"))
  }

  /** Frame sampling analog: every `stride`-th byte of the payload as a
    * 1-byte "frame", capped at `maxFrames` — the partitioning/expression
    * shape of video frame extraction, minus the codec. */
  def sampleFrames(payload: Column, stride: Int, maxFrames: Int): Column = {
    val n = least(floor(length(payload) / stride), lit(maxFrames)).cast("int")
    when(n >= 1,
      transform(sequence(lit(0), n - 1), i => payload.substr(i * stride + 1, lit(1))))
      .otherwise(array().cast("array<binary>"))
  }
}
