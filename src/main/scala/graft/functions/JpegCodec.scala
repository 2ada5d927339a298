package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JPEG (8-bit baseline: grayscale AND 3-band YCbCr color) through the
  * JDK's bundled ImageIO —
  * the LOSSY real-crawl format next to the hand-rolled lossless codecs
  * (WAV/BMP/PGM/PNG). Hand-rolling a spec-exact JPEG pipeline (DCT,
  * quantization tables, Huffman) buys nothing over the platform codec
  * here, because JPEG's loss makes a bit-exact cross-engine oracle
  * impossible ANYWAY: the differential contract for this format is the
  * `ref_sketch_approx` pattern — exact columns where exactness exists
  * (validity, geometry, pixel count) and engine-side TOLERANCE BOOLEANS
  * where it cannot (each engine checks its own decode against its own
  * expectation; the booleans hash-compare). Within one JVM the codec is
  * deterministic, so Spark's booleans are stable run to run.
  *
  * Same scale contract as the other codecs: encode and decode are
  * per-row expressions inside the scan projection — map-only
  * featurization, never a shuffle.
  */
object JpegCodecImpl {

  /** Decode output schema — the gray [[MediaCodecImpl.Schema]] shape plus
    * the decoded `pixels` (row-major top-down), so stats AND error-band
    * comparisons ride ONE decode per row. */
  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("valid", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_values", LongType, nullable = false),
    StructField("sum_val", LongType, nullable = true),
    StructField("min_val", LongType, nullable = true),
    StructField("max_val", LongType, nullable = true),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = true)))

  private val FmtJpeg = UTF8String.fromString("jpeg")
  private val FmtUnknown = UTF8String.fromString("unknown")

  // Per-THREAD codec instances: ImageIO's getImage{Writers,Readers}ByFormat
  // lookup plus a file-backed cache stream per call costs ~100 µs/row —
  // measured 71.7 s for the sf10 query before this, 500k rows of plugin
  // lookups and scratch-file streams. Writers/readers are not thread-safe
  // but are reusable per thread; streams are explicit memory-cache ones.
  private val writerTl =
    ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next())
  private val readerTl =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next())

  /** Baseline grayscale JPEG encode at fixed quality: `height = n / width`
    * full rows (the shared encoder contract); fewer pixels than one row →
    * null. Quality is a compile-time constant of the expression so the
    * loss profile — and therefore the tolerance booleans downstream —
    * cannot drift between runs. */
  def encodeGray(pixels: ArrayData, width: Int, quality: Int): Array[Byte] = {
    if (pixels == null) return null
    val height = pixels.numElements() / width
    if (height == 0) return null
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // TYPE_BYTE_GRAY's raster is one contiguous row-major byte[]: fill
    // it directly instead of paying the per-pixel SampleModel dispatch
    // of setSample (this encode runs once per corpus row)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var i = 0
    val n = width * height
    while (i < n) {
      data(i) = (pixels.getInt(i) & 0xFF).toByte
      i += 1
    }
    val writer = writerTl.get()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality / 100.0f)
    val bos = new java.io.ByteArrayOutputStream(256)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      ios.flush()
    } catch {
      case _: Exception =>
        // free native state before discarding; a broken codec may throw
        // from dispose() too — discarding is the priority
        try writerTl.get().dispose() catch { case _: Exception => }
        writerTl.remove()
        return null
    } finally ios.close()
    bos.toByteArray
  }

  /** JFIF/EXIF signature sniff: JPEG streams begin SOI = 0xFFD8. */
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte &&
      b(2) == 0xFF.toByte

  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val reader = readerTl.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } catch {
      case _: Exception =>
        try readerTl.get().dispose() catch { case _: Exception => }
        readerTl.remove()
        null
    } finally iis.close()
  }

  /** Decode → gray stats + pixels row, or invalid. Corrupt payloads
    * (ImageIO decline or decode exception) return invalid, never crash
    * the scan — the shared codec contract. ONE ImageIO read serves both
    * the stats and the pixel array. */
  def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    if (!isJpeg(bytes))
      return new GenericInternalRow(Array[Any](
        FmtUnknown, false, null, null, 0L, null, null, null, null))
    val img = readImage(bytes)
    // a decodable COLOR (multi-band) JPEG is not "valid grayscale": the
    // registered function is exposed generally, and summarizing a YCbCr
    // image by raster band 0 would silently report luma-ish garbage as
    // gray stats — reject to the invalid row; color goes through
    // [[decodeRgb]]
    if (img == null || img.getRaster.getNumBands != 1)
      return new GenericInternalRow(Array[Any](
        FmtJpeg, false, null, null, 0L, null, null, null, null))
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h)
    var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // band 0; our encoder writes TYPE_BYTE_GRAY (single band)
        val v = raster.getSample(x, y, 0)
        out(y * w + x) = v
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    new GenericInternalRow(Array[Any](
      FmtJpeg, true, w, h, n,
      if (n > 0) sum else null, if (n > 0) mn else null,
      if (n > 0) mx else null,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)))
  }

  /** [[decodeRgb]] output schema — the PNG [[MediaCodecImpl.RgbSchema]]
    * per-channel-sums contract plus the decoded `pixels` (packed
    * 0xRRGGBB, row-major top-down) so per-channel error bands ride the
    * same single decode. */
  val RgbSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("valid", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = true)))

  /** Baseline COLOR (YCbCr 3-band) JPEG encode at fixed quality over
    * packed 0xRRGGBB pixels — the [[MediaCodecImpl.pngEncodeRgb]] input
    * contract. `height = n / width` full rows; fewer pixels than one
    * row → null. Pixels land through the image's sRGB color model
    * (`setRGB` bulk), so the bytes the platform codec sees are
    * band-order-independent. */
  def encodeRgb(pixels: ArrayData, width: Int, quality: Int): Array[Byte] = {
    if (pixels == null) return null
    val height = pixels.numElements() / width
    if (height == 0) return null
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    // TYPE_3BYTE_BGR's raster is one contiguous row-major [b,g,r] byte
    // array in sRGB: fill it directly — setRGB routes every pixel
    // through ColorModel.getDataElements, a measured per-pixel tax on
    // a once-per-corpus-row encode
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    val n = width * height
    var i = 0
    while (i < n) {
      val p = pixels.getInt(i)
      data(3 * i) = (p & 0xFF).toByte
      data(3 * i + 1) = ((p >>> 8) & 0xFF).toByte
      data(3 * i + 2) = ((p >>> 16) & 0xFF).toByte
      i += 1
    }
    val writer = writerTl.get()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality / 100.0f)
    val bos = new java.io.ByteArrayOutputStream(256)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      ios.flush()
    } catch {
      case _: Exception =>
        try writerTl.get().dispose() catch { case _: Exception => }
        writerTl.remove()
        return null
    } finally ios.close()
    bos.toByteArray
  }

  /** Packed 0xRRGGBB pixels of a decoded image. Fast paths read the
    * raster's contiguous byte buffer directly (TYPE_3BYTE_BGR — the
    * type ImageIO decodes color JPEGs to — and TYPE_BYTE_GRAY, gray
    * replicated across channels, the [[MediaCodecImpl.decodeRgb]]
    * contract); anything else falls back to `getRGB` bulk, whose
    * per-pixel ColorModel conversion was the measured decode tax. */
  private def packedRgbOf(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val n = w * h
    val buf = img.getRaster.getDataBuffer
    img.getType match {
      case java.awt.image.BufferedImage.TYPE_3BYTE_BGR
          if buf.isInstanceOf[java.awt.image.DataBufferByte] &&
            buf.asInstanceOf[java.awt.image.DataBufferByte]
              .getData.length == 3 * n =>
        val d = buf.asInstanceOf[java.awt.image.DataBufferByte].getData
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = ((d(3 * i + 2) & 0xFF) << 16) |
            ((d(3 * i + 1) & 0xFF) << 8) | (d(3 * i) & 0xFF)
          i += 1
        }
        out
      case java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          if buf.isInstanceOf[java.awt.image.DataBufferByte] &&
            buf.asInstanceOf[java.awt.image.DataBufferByte]
              .getData.length == n =>
        val d = buf.asInstanceOf[java.awt.image.DataBufferByte].getData
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val v = d(i) & 0xFF
          out(i) = (v << 16) | (v << 8) | v
          i += 1
        }
        out
      case _ =>
        val out = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        while (i < out.length) { out(i) = out(i) & 0xFFFFFF; i += 1 }
        out
    }
  }

  /** Color decode → [[RgbSchema]] per-channel stats + packed pixels, or
    * invalid — corrupt payloads never crash the scan. Pixels come back
    * as packed sRGB ([[packedRgbOf]]), so a grayscale JPEG decodes with
    * its gray value replicated across channels — the
    * [[MediaCodecImpl.decodeRgb]] replicate contract — and a 3-band
    * YCbCr image converts band-order-independently. */
  def decodeRgb(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    if (!isJpeg(bytes))
      return new GenericInternalRow(Array[Any](
        FmtUnknown, false, null, null, 0L, null, null, null, null))
    val img = readImage(bytes)
    if (img == null)
      return new GenericInternalRow(Array[Any](
        FmtJpeg, false, null, null, 0L, null, null, null, null))
    val w = img.getWidth; val h = img.getHeight
    val packed = packedRgbOf(img)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < packed.length) {
      val p = packed(i)
      sr += (p >>> 16) & 0xFF
      sg += (p >>> 8) & 0xFF
      sb += p & 0xFF
      i += 1
    }
    val n = w.toLong * h
    new GenericInternalRow(Array[Any](
      FmtJpeg, true, w, h, n, sr, sg, sb,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(packed)))
  }

  /** [[roundtripGray]] output schema: the decode stats plus the two
    * tolerance booleans — everything the differential needs, nothing
    * it doesn't (the decoded pixel array never materializes into a
    * row). */
  val RoundtripSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("valid", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_values", LongType, nullable = false),
    StructField("mean_within_tol", BooleanType, nullable = false),
    StructField("pixels_within_tol", BooleanType, nullable = false)))

  /** FUSED gray roundtrip: encode → decode → tolerance bands in one
    * compiled pass — the whole `data_mm_jpeg_decode` row body. The
    * composed form (jpeg_encode_gray → media_decode_jpeg → two
    * interpreted HOF folds over the struct) is the semantic definition
    * and parity reference (JpegCodecSpec asserts identical booleans);
    * this exists because the folds, not the codec, were the measured
    * hot spot (interpreted zip_with+aggregate over 500k rows: 2.0 of
    * the query's 3.6 s at sf10). Same per-thread ImageIO codecs, one
    * encode + one decode per row, error folds as primitive loops.
    *
    * Boolean arithmetic replicates the composed form exactly:
    * mean band on |sumDec/n − sumSrc/len| (double division both
    * sides), pixel band on the max absolute per-pixel error (ints). */
  def roundtripGray(pixels: ArrayData, width: Int, quality: Int,
                    pixTol: Int, meanTol: Double): InternalRow = {
    if (pixels == null) return null
    val bytes = encodeGray(pixels, width, quality)
    if (bytes == null) return null
    val img = readImage(bytes)
    if (img == null || img.getRaster.getNumBands != 1)
      return new GenericInternalRow(Array[Any](
        FmtJpeg, false, null, null, 0L, false, false))
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    val n = w.toLong * h
    val srcN = pixels.numElements()
    var sumDec = 0L; var sumSrc = 0L; var maxErr = 0
    // fast path: a decoded gray JPEG is TYPE_BYTE_GRAY with one
    // contiguous row-major byte[] — walk it directly; anything else
    // falls back to the per-pixel SampleModel accessor
    val buf = raster.getDataBuffer
    val direct = img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY &&
      buf.isInstanceOf[java.awt.image.DataBufferByte] &&
      buf.asInstanceOf[java.awt.image.DataBufferByte].getData.length == w * h
    if (direct) {
      val data = buf.asInstanceOf[java.awt.image.DataBufferByte].getData
      var i = 0
      while (i < data.length) {
        val d = data(i) & 0xFF
        sumDec += d
        if (i < srcN) {
          val e = math.abs(d - (pixels.getInt(i) & 0xFF))
          if (e > maxErr) maxErr = e
        }
        i += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val d = raster.getSample(x, y, 0)
          val i = y * w + x
          sumDec += d
          if (i < srcN) {
            val s = pixels.getInt(i) & 0xFF
            val e = math.abs(d - s)
            if (e > maxErr) maxErr = e
          }
          x += 1
        }
        y += 1
      }
    }
    var i = 0
    while (i < srcN) { sumSrc += pixels.getInt(i); i += 1 }
    val meanOk = n > 0 && srcN > 0 &&
      math.abs(sumDec.toDouble / n - sumSrc.toDouble / srcN) <= meanTol
    new GenericInternalRow(Array[Any](
      FmtJpeg, true, w, h, n, meanOk, maxErr <= pixTol))
  }

  /** [[roundtripRgb]] output schema: per-channel decode stats plus the
    * four tolerance booleans of the color differential. */
  val RoundtripRgbSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("valid", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_pixels", LongType, nullable = false),
    StructField("mean_r_within_tol", BooleanType, nullable = false),
    StructField("mean_g_within_tol", BooleanType, nullable = false),
    StructField("mean_b_within_tol", BooleanType, nullable = false),
    StructField("luma_within_tol", BooleanType, nullable = false)))

  /** FUSED color roundtrip — the `data_mm_jpeg_rgb_decode` row body:
    * encode (YCbCr, 4:2:0) → decode → per-channel mean bands + the
    * per-pixel LUMA band, one compiled pass, same contract rationale as
    * [[roundtripGray]]. Luma is the integer ITU-R 601 approximation
    * `(299r + 587g + 114b) / 1000` (truncating division — positive
    * domain, identical to the composed form's double-div-then-int-cast). */
  def roundtripRgb(pixels: ArrayData, width: Int, quality: Int,
                   lumaTol: Int, meanTol: Double): InternalRow = {
    if (pixels == null) return null
    val bytes = encodeRgb(pixels, width, quality)
    if (bytes == null) return null
    val img = readImage(bytes)
    if (img == null)
      return new GenericInternalRow(Array[Any](
        FmtJpeg, false, null, null, 0L, false, false, false, false))
    val w = img.getWidth; val h = img.getHeight
    val packed = packedRgbOf(img)
    val n = w.toLong * h
    val srcN = pixels.numElements()
    var dr = 0L; var dg = 0L; var db = 0L
    var sr = 0L; var sg = 0L; var sb = 0L
    var maxLumaErr = 0
    var i = 0
    while (i < packed.length) {
      val p = packed(i)
      val r = (p >>> 16) & 0xFF; val g = (p >>> 8) & 0xFF; val b = p & 0xFF
      dr += r; dg += g; db += b
      if (i < srcN) {
        val s = pixels.getInt(i)
        val e = math.abs((r * 299 + g * 587 + b * 114) / 1000 -
          ((((s >>> 16) & 0xFF) * 299 + ((s >>> 8) & 0xFF) * 587 +
            (s & 0xFF) * 114) / 1000))
        if (e > maxLumaErr) maxLumaErr = e
      }
      i += 1
    }
    // source sums over ALL srcN pixels (the composed form folds the
    // whole px array) — summing only the decoded-count prefix would
    // deflate the source mean whenever the input is not a whole number
    // of rows, the exact divergence the gray path's separate loop avoids
    i = 0
    while (i < srcN) {
      val s = pixels.getInt(i)
      sr += (s >>> 16) & 0xFF; sg += (s >>> 8) & 0xFF; sb += s & 0xFF
      i += 1
    }
    def meanOk(dec: Long, src: Long): Boolean = n > 0 && srcN > 0 &&
      math.abs(dec.toDouble / n - src.toDouble / srcN) <= meanTol
    new GenericInternalRow(Array[Any](
      FmtJpeg, true, w, h, n,
      meanOk(dr, sr), meanOk(dg, sg), meanOk(db, sb),
      maxLumaErr <= lumaTol))
  }

}

/** `jpeg_encode_gray(pixels array<int>)` → binary baseline grayscale
  * JPEG at the fixed quality. Null for fewer pixels than one row. */
case class JpegEncodeGray(child: Expression, width: Int, quality: Int)
    extends UnaryExpression {
  require(width > 0, s"width must be positive, got $width")
  require(quality >= 1 && quality <= 100, s"quality 1..100, got $quality")
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_encode_gray"

  override protected def nullSafeEval(input: Any): Any =
    JpegCodecImpl.encodeGray(input.asInstanceOf[ArrayData], width, quality)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.JpegCodecImpl.encodeGray($c, $width, $quality);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): JpegEncodeGray =
    copy(child = newChild)
}

/** `media_decode_jpeg(payload binary)` → the gray stats struct. */
case class MediaDecodeJpeg(child: Expression) extends UnaryExpression {
  override def dataType: DataType = JpegCodecImpl.Schema
  override def prettyName: String = "media_decode_jpeg"

  override protected def nullSafeEval(input: Any): Any =
    JpegCodecImpl.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.JpegCodecImpl.decode($c);")

  override protected def withNewChildInternal(newChild: Expression): MediaDecodeJpeg =
    copy(child = newChild)
}

/** `jpeg_encode_rgb(pixels array<int> packed 0xRRGGBB)` → binary
  * baseline color JPEG at the fixed quality. Null for fewer pixels than
  * one row. */
case class JpegEncodeRgb(child: Expression, width: Int, quality: Int)
    extends UnaryExpression {
  require(width > 0, s"width must be positive, got $width")
  require(quality >= 1 && quality <= 100, s"quality 1..100, got $quality")
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_encode_rgb"

  override protected def nullSafeEval(input: Any): Any =
    JpegCodecImpl.encodeRgb(input.asInstanceOf[ArrayData], width, quality)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.JpegCodecImpl.encodeRgb($c, $width, $quality);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): JpegEncodeRgb =
    copy(child = newChild)
}

/** `media_decode_jpeg_rgb(payload binary)` → the per-channel RGB stats
  * struct ([[JpegCodecImpl.RgbSchema]]). */
case class MediaDecodeJpegRgb(child: Expression) extends UnaryExpression {
  override def dataType: DataType = JpegCodecImpl.RgbSchema
  override def prettyName: String = "media_decode_jpeg_rgb"

  override protected def nullSafeEval(input: Any): Any =
    JpegCodecImpl.decodeRgb(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.JpegCodecImpl.decodeRgb($c);")

  override protected def withNewChildInternal(newChild: Expression): MediaDecodeJpegRgb =
    copy(child = newChild)
}

/** `jpeg_roundtrip_gray(pixels)` → the fused encode→decode→bands struct
  * ([[JpegCodecImpl.roundtripGray]]). Null for fewer pixels than one
  * row (the encode contract). */
case class JpegRoundtripGray(child: Expression, width: Int, quality: Int,
                             pixTol: Int, meanTol: Double)
    extends UnaryExpression {
  require(width > 0 && quality >= 1 && quality <= 100 && pixTol >= 0 &&
    meanTol >= 0, s"bad args ($width, $quality, $pixTol, $meanTol)")
  override def nullable: Boolean = true
  override def dataType: DataType = JpegCodecImpl.RoundtripSchema
  override def prettyName: String = "jpeg_roundtrip_gray"

  override protected def nullSafeEval(input: Any): Any =
    JpegCodecImpl.roundtripGray(input.asInstanceOf[ArrayData], width,
      quality, pixTol, meanTol)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.JpegCodecImpl.roundtripGray(
         |  $c, $width, $quality, $pixTol, $meanTol);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): JpegRoundtripGray =
    copy(child = newChild)
}

/** `jpeg_roundtrip_rgb(pixels)` → the fused color roundtrip struct
  * ([[JpegCodecImpl.roundtripRgb]]) over packed 0xRRGGBB pixels. */
case class JpegRoundtripRgb(child: Expression, width: Int, quality: Int,
                            lumaTol: Int, meanTol: Double)
    extends UnaryExpression {
  require(width > 0 && quality >= 1 && quality <= 100 && lumaTol >= 0 &&
    meanTol >= 0, s"bad args ($width, $quality, $lumaTol, $meanTol)")
  override def nullable: Boolean = true
  override def dataType: DataType = JpegCodecImpl.RoundtripRgbSchema
  override def prettyName: String = "jpeg_roundtrip_rgb"

  override protected def nullSafeEval(input: Any): Any =
    JpegCodecImpl.roundtripRgb(input.asInstanceOf[ArrayData], width,
      quality, lumaTol, meanTol)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.JpegCodecImpl.roundtripRgb(
         |  $c, $width, $quality, $lumaTol, $meanTol);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): JpegRoundtripRgb =
    copy(child = newChild)
}


object JpegFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions
        .Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def put(name: String, build: Seq[Expression] => Expression): Unit =
      if (!registry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, build, "scala_udf")
    put("jpeg_encode_gray", exprs => {
      if (exprs.length != 3) throw new IllegalArgumentException(
        s"jpeg_encode_gray(pixels, width, quality): expected 3 arguments, " +
          s"got ${exprs.length}")
      JpegEncodeGray(exprs.head,
        intLit(exprs(1), "jpeg_encode_gray"), intLit(exprs(2), "jpeg_encode_gray"))
    })
    put("media_decode_jpeg", exprs => {
      if (exprs.length != 1) throw new IllegalArgumentException(
        s"media_decode_jpeg(payload): expected 1 argument, got ${exprs.length}")
      MediaDecodeJpeg(exprs.head)
    })
    put("jpeg_encode_rgb", exprs => {
      if (exprs.length != 3) throw new IllegalArgumentException(
        s"jpeg_encode_rgb(pixels, width, quality): expected 3 arguments, " +
          s"got ${exprs.length}")
      JpegEncodeRgb(exprs.head,
        intLit(exprs(1), "jpeg_encode_rgb"), intLit(exprs(2), "jpeg_encode_rgb"))
    })
    put("media_decode_jpeg_rgb", exprs => {
      if (exprs.length != 1) throw new IllegalArgumentException(
        s"media_decode_jpeg_rgb(payload): expected 1 argument, got ${exprs.length}")
      MediaDecodeJpegRgb(exprs.head)
    })
    def dblLit(e: Expression, fn: String): Double = e match {
      case org.apache.spark.sql.catalyst.expressions
          .Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: expected a double literal, got $other")
    }
    put("jpeg_roundtrip_gray", exprs => {
      if (exprs.length != 5) throw new IllegalArgumentException(
        s"jpeg_roundtrip_gray(pixels, width, quality, pixTol, meanTol): " +
          s"expected 5 arguments, got ${exprs.length}")
      JpegRoundtripGray(exprs.head,
        intLit(exprs(1), "jpeg_roundtrip_gray"),
        intLit(exprs(2), "jpeg_roundtrip_gray"),
        intLit(exprs(3), "jpeg_roundtrip_gray"),
        dblLit(exprs(4), "jpeg_roundtrip_gray"))
    })
    put("jpeg_roundtrip_rgb", exprs => {
      if (exprs.length != 5) throw new IllegalArgumentException(
        s"jpeg_roundtrip_rgb(pixels, width, quality, lumaTol, meanTol): " +
          s"expected 5 arguments, got ${exprs.length}")
      JpegRoundtripRgb(exprs.head,
        intLit(exprs(1), "jpeg_roundtrip_rgb"),
        intLit(exprs(2), "jpeg_roundtrip_rgb"),
        intLit(exprs(3), "jpeg_roundtrip_rgb"),
        dblLit(exprs(4), "jpeg_roundtrip_rgb"))
    })
  }

  def jpeg_encode_gray(pixels: Column, width: Int, quality: Int): Column =
    org.apache.spark.sql.functions.call_function("jpeg_encode_gray", pixels,
      org.apache.spark.sql.functions.lit(width),
      org.apache.spark.sql.functions.lit(quality))
  def media_decode_jpeg(payload: Column): Column =
    org.apache.spark.sql.functions.call_function("media_decode_jpeg", payload)
  def jpeg_encode_rgb(pixels: Column, width: Int, quality: Int): Column =
    org.apache.spark.sql.functions.call_function("jpeg_encode_rgb", pixels,
      org.apache.spark.sql.functions.lit(width),
      org.apache.spark.sql.functions.lit(quality))
  def media_decode_jpeg_rgb(payload: Column): Column =
    org.apache.spark.sql.functions.call_function("media_decode_jpeg_rgb", payload)
  def jpeg_roundtrip_gray(pixels: Column, width: Int, quality: Int,
                          pixTol: Int, meanTol: Double): Column =
    org.apache.spark.sql.functions.call_function("jpeg_roundtrip_gray",
      pixels, org.apache.spark.sql.functions.lit(width),
      org.apache.spark.sql.functions.lit(quality),
      org.apache.spark.sql.functions.lit(pixTol),
      org.apache.spark.sql.functions.lit(meanTol))
  def jpeg_roundtrip_rgb(pixels: Column, width: Int, quality: Int,
                         lumaTol: Int, meanTol: Double): Column =
    org.apache.spark.sql.functions.call_function("jpeg_roundtrip_rgb",
      pixels, org.apache.spark.sql.functions.lit(width),
      org.apache.spark.sql.functions.lit(quality),
      org.apache.spark.sql.functions.lit(lumaTol),
      org.apache.spark.sql.functions.lit(meanTol))
}
