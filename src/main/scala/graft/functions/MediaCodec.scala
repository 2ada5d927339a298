package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM media container codecs: a REAL bytes→features decode path for
  * the multimodal family (replacing the round-6 `decodeFeaturesStub`), with
  * no external codec library — the two containers parsed are simple enough
  * that a from-scratch parser IS the production-grade artifact:
  *
  *  - WAV (RIFF/WAVE, PCM16 mono): proper chunk-list walking (id + LE u32
  *    size + even-byte padding per the RIFF spec), `fmt ` validation
  *    (PCM, mono, 16-bit), and signed little-endian sample extraction
  *    from the `data` chunk.
  *  - BMP (BITMAPINFOHEADER, 8-bit uncompressed): magic + header
  *    validation, explicit pixel-array offset, 4-byte row-stride padding,
  *    and bottom-up OR top-down (negative height) row order.
  *  - PNG (8-bit color types 0 grayscale, 2 truecolor RGB, 3 palette —
  *    THE real-world compressed image format): exact signature,
  *    CRC32-verified chunk walk, IHDR/PLTE validation, consecutive-IDAT
  *    concatenation inflated through `java.util.zip.Inflater` (real
  *    zlib deflate, exact-output-size enforcement against decompression
  *    bombs), and full scanline unfiltering (None/Sub/Up/Average/Paeth
  *    on reconstructed neighbors with bpp-offset left references).
  *  - PGM (Netpbm P5 binary graymap — a REAL-WORLD interchange format):
  *    tokenized ASCII header (whitespace-separated width/height/maxval
  *    with `#`-to-end-of-line comments permitted in any gap, exactly one
  *    whitespace byte before the raster per the spec), maxval ≤ 255
  *    (one byte per sample), unpadded top-down raster. A payload is
  *    classified "pgm" only when the WHOLE container validates — the
  *    2-byte magic alone is weak enough to occur in free text, and
  *    format sniffing must never reclassify a text payload.
  *
  * Decoded features are kept in INTEGER domain (count / sum / min / max of
  * samples or pixel luminance) so a SQL oracle can replay them exactly —
  * no float summation order to agree on. The encoders exist so a query can
  * build real container bytes from tabular data and the differential gate
  * can prove decode ∘ encode == identity-on-features: the decoder only
  * matches the oracle's text-derived expectations when every header
  * offset, endianness choice, stride and sign convention is right.
  *
  * All three are native Catalyst expressions (codegen'd, no UDFs) — the
  * decode runs inside whole-stage codegen on the scan, map-only at any
  * corpus size, which is the 100 TB shape: featurization is a projection,
  * never a shuffle.
  */
object MediaCodecImpl {

  /** Decode output schema. `format` is "wav" / "bmp" / "unknown"; metric
    * fields are NULL when absent-for-format or invalid; `n_values` is 0
    * (not NULL) for an invalid payload so counts aggregate cleanly. */
  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("valid", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_values", LongType, nullable = false),
    StructField("sum_val", LongType, nullable = true),
    StructField("min_val", LongType, nullable = true),
    StructField("max_val", LongType, nullable = true)))

  private val FmtWav = UTF8String.fromString("wav")
  private val FmtBmp = UTF8String.fromString("bmp")
  private val FmtPgm = UTF8String.fromString("pgm")
  private val FmtPng = UTF8String.fromString("png")
  private val FmtUnknown = UTF8String.fromString("unknown")

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt
  private def i16(b: Array[Byte], o: Int): Short =
    ((b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)).toShort

  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putU32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
    b(o + 2) = ((v >> 16) & 0xFF).toByte; b(o + 3) = ((v >> 24) & 0xFF).toByte
  }
  private def putTag(b: Array[Byte], o: Int, tag: String): Unit = {
    var i = 0
    while (i < 4) { b(o + i) = tag.charAt(i).toByte; i += 1 }
  }
  private def tagAt(b: Array[Byte], o: Int, tag: String): Boolean =
    b.length >= o + 4 && b(o) == tag.charAt(0).toByte &&
      b(o + 1) == tag.charAt(1).toByte && b(o + 2) == tag.charAt(2).toByte &&
      b(o + 3) == tag.charAt(3).toByte

  /** RIFF/WAVE PCM16 mono encoder: canonical 44-byte header + LE samples.
    * Sample ints are truncated to i16 (caller keeps them in range). */
  def wavEncode(samples: ArrayData, rate: Int): Array[Byte] = {
    if (samples == null) return null
    val n = samples.numElements()
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    putTag(out, 0, "RIFF"); putU32(out, 4, 36L + dataLen)
    putTag(out, 8, "WAVE"); putTag(out, 12, "fmt ")
    putU32(out, 16, 16L)
    putU16(out, 20, 1)      // PCM
    putU16(out, 22, 1)      // mono
    putU32(out, 24, rate.toLong)
    putU32(out, 28, rate.toLong * 2) // byte rate
    putU16(out, 32, 2)      // block align
    putU16(out, 34, 16)     // bits per sample
    putTag(out, 36, "data"); putU32(out, 40, dataLen.toLong)
    var i = 0
    while (i < n) {
      putU16(out, 44 + i * 2, samples.getInt(i).toShort & 0xFFFF)
      i += 1
    }
    out
  }

  /** 8-bit grayscale BMP encoder (BITMAPINFOHEADER + 256-entry gray
    * palette): `pixels` row-major top-down, truncated to `height =
    * n / width` full rows; rows written bottom-up, stride padded to 4. */
  def bmpEncode(pixels: ArrayData, width: Int): Array[Byte] = {
    if (pixels == null) return null
    val height = pixels.numElements() / width
    val stride = (width + 3) & ~3
    val imageSize = stride * height
    val dataOffset = 14 + 40 + 256 * 4
    val out = new Array[Byte](dataOffset + imageSize)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putU32(out, 2, (dataOffset + imageSize).toLong)
    putU32(out, 6, 0L)
    putU32(out, 10, dataOffset.toLong)
    putU32(out, 14, 40L)               // biSize
    putU32(out, 18, width.toLong)
    putU32(out, 22, height.toLong)     // positive = bottom-up
    putU16(out, 26, 1)                 // planes
    putU16(out, 28, 8)                 // bpp
    putU32(out, 30, 0L)                // BI_RGB
    putU32(out, 34, imageSize.toLong)
    putU32(out, 38, 2835L); putU32(out, 42, 2835L) // 72 dpi
    putU32(out, 46, 256L); putU32(out, 50, 0L)
    var c = 0
    while (c < 256) { // gray palette: B,G,R,0
      val o = 54 + c * 4
      out(o) = c.toByte; out(o + 1) = c.toByte; out(o + 2) = c.toByte
      c += 1
    }
    var r = 0
    while (r < height) {
      val srcRow = height - 1 - r // bottom-up file order
      var x = 0
      while (x < width) {
        out(dataOffset + r * stride + x) =
          (pixels.getInt(srcRow * width + x) & 0xFF).toByte
        x += 1
      }
      r += 1
    }
    out
  }

  private def invalid(format: UTF8String): InternalRow =
    new GenericInternalRow(Array[Any](
      format, false, null, null, null, 0L, null, null, null))

  /** Per-frame 56-bit dHashes of a REEL — the video-shaped container: N
    * complete BMP files stacked back-to-back (each frame self-describes
    * its length via the BMP header's file-size field at offset +2, so
    * the walk needs no index table). Fused walk + hash: one pass over
    * the payload, one [[dhash56]] per frame, no frame array<binary>
    * materialized upstream of the hashes. STRICT: a reel is valid only
    * if every byte is consumed by a valid frame and every frame hashes
    * (≥ 1 frame); anything else — non-BM bytes mid-stream, a frame size
    * overrunning the payload, a size smaller than a header, trailing
    * garbage — returns null, never crashes the scan. The size field is
    * read as LONG (a crafted 0xFFFFFFFF size must not wrap to a
    * negative cursor step). */
  def reelDHashes(b: Array[Byte]): ArrayData = {
    if (b == null) return null
    // primitive accumulator: this runs once per row inside codegen —
    // no boxed Long per frame
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var n = 0
    var off = 0L
    while (off < b.length) {
      if (off + 54 > b.length ||
          b(off.toInt) != 'B'.toByte || b(off.toInt + 1) != 'M'.toByte)
        return null
      val size = u32(b, off.toInt + 2)
      if (size < 54 || off + size > b.length) return null
      val frame = java.util.Arrays.copyOfRange(b, off.toInt, (off + size).toInt)
      val h = dhash56(frame)
      if (h == null) return null
      out += h.longValue()
      n += 1
      off += size
    }
    if (n == 0) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }

  /** P5 binary PGM encoder: ASCII header `P5\n<w> <h>\n255\n` + one raw
    * byte per pixel, row-major top-down, unpadded; `height = n / width`
    * (tail pixels past the last full row ignored — same convention as
    * [[bmpEncode]]). */
  def pgmEncode(pixels: ArrayData, width: Int): Array[Byte] = {
    if (pixels == null) return null
    val height = pixels.numElements() / width
    val header =
      s"P5\n$width $height\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val n = width * height
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) {
      out(header.length + i) = (pixels.getInt(i) & 0xFF).toByte
      i += 1
    }
    out
  }

  private val PngSig: Array[Byte] = Array(
    0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 13, 10, 26, 10)

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def putU32be(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = ((v >> 24) & 0xFF).toByte; b(o + 1) = ((v >> 16) & 0xFF).toByte
    b(o + 2) = ((v >> 8) & 0xFF).toByte; b(o + 3) = (v & 0xFF).toByte
  }

  private def isPng(b: Array[Byte]): Boolean = {
    if (b.length < 8) return false
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return false; i += 1 }
    true
  }

  /** PNG Paeth predictor (filter type 4): the spec's closest-of-three
    * (left, up, upper-left) choice with its exact tie-break order. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = Math.abs(p - a); val pb = Math.abs(p - b); val pc = Math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
                       data: Array[Byte]): Unit = {
    val hdr = new Array[Byte](8)
    putU32be(hdr, 0, data.length.toLong)
    putTag(hdr, 4, typ)
    out.write(hdr, 0, 8)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32
    crc.update(hdr, 4, 4)
    crc.update(data, 0, data.length)
    val tail = new Array[Byte](4)
    putU32be(tail, 0, crc.getValue)
    out.write(tail, 0, 4)
  }

  /** PNG encoder (8-bit grayscale, color type 0): REAL spec-compliant
    * output — signature, CRC'd IHDR/IDAT/IEND chunks, and a zlib-DEFLATE
    * IDAT (`java.util.zip.Deflater`) of filtered scanlines. This is the
    * deflate-compressed container real corpora live in, not a synthetic
    * stand-in. Scanline filters CYCLE `row % 5` (None, Sub, Up, Average,
    * Paeth), so a decode∘encode roundtrip over a corpus exercises every
    * inverse filter in the decoder, not just the trivial one. `height =
    * n / width` full rows like [[bmpEncode]]/[[pgmEncode]]; PNG cannot
    * represent a zero-dimension image, so fewer pixels than one row →
    * null. */
  def pngEncode(pixels: ArrayData, width: Int): Array[Byte] = {
    if (pixels == null) return null
    val height = pixels.numElements() / width
    if (height == 0) return null
    val raw = new Array[Byte](width * height)
    var i = 0
    while (i < raw.length) { raw(i) = (pixels.getInt(i) & 0xFF).toByte; i += 1 }
    pngContainer(raw, width, height, 1, 0, null)
  }

  /** Shared PNG container build: filter the raw raster (filters cycle
    * `row % 5` with bpp-offset left/upper-left neighbors — the
    * multi-byte-pixel rule truecolor needs), deflate, emit the CRC'd
    * chunk sequence (IHDR [PLTE] IDAT IEND). One writer for all three
    * color types so the filter arithmetic can never diverge between
    * them. */
  private def pngContainer(raw: Array[Byte], width: Int, height: Int,
                           bpp: Int, colorType: Int,
                           plte: Array[Byte]): Array[Byte] = {
    val rowBytes = width * bpp
    val filtered = new Array[Byte](height * (1 + rowBytes))
    var r = 0
    while (r < height) {
      val f = r % 5
      filtered(r * (1 + rowBytes)) = f.toByte
      var x = 0
      while (x < rowBytes) {
        val cur = raw(r * rowBytes + x) & 0xFF
        val left = if (x >= bpp) raw(r * rowBytes + x - bpp) & 0xFF else 0
        val up = if (r > 0) raw((r - 1) * rowBytes + x) & 0xFF else 0
        val ul = if (x >= bpp && r > 0)
          raw((r - 1) * rowBytes + x - bpp) & 0xFF else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        filtered(r * (1 + rowBytes) + 1 + x) = (v & 0xFF).toByte
        x += 1
      }
      r += 1
    }
    val deflater = new java.util.zip.Deflater()
    val comp = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
    try {
      deflater.setInput(filtered)
      deflater.finish()
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    } finally deflater.end()
    val out = new java.io.ByteArrayOutputStream(comp.size() + 64)
    out.write(PngSig, 0, 8)
    val ihdr = new Array[Byte](13)
    putU32be(ihdr, 0, width.toLong)
    putU32be(ihdr, 4, height.toLong)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // compression 0, filter 0, interlace 0 stay zero
    pngChunk(out, "IHDR", ihdr)
    if (plte != null) pngChunk(out, "PLTE", plte)
    pngChunk(out, "IDAT", comp.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** PNG truecolor encoder (color type 2): pixels are packed 0xRRGGBB
    * ints, emitted as 3-byte RGB samples with the same cycling scanline
    * filters as [[pngEncode]] — but over bpp=3, so a roundtrip proves the
    * bpp-offset Sub/Average/Paeth inverses, not just the gray ones.
    * `height = n / width` full rows; fewer pixels than one row → null. */
  def pngEncodeRgb(pixels: ArrayData, width: Int): Array[Byte] = {
    if (pixels == null) return null
    val height = pixels.numElements() / width
    if (height == 0) return null
    val n = width * height
    val raw = new Array[Byte](3 * n)
    var i = 0
    while (i < n) {
      val p = pixels.getInt(i)
      raw(3 * i) = ((p >> 16) & 0xFF).toByte
      raw(3 * i + 1) = ((p >> 8) & 0xFF).toByte
      raw(3 * i + 2) = (p & 0xFF).toByte
      i += 1
    }
    pngContainer(raw, width, height, 3, 2, null)
  }

  /** PNG palette encoder (color type 3): pixels are packed 0xRRGGBB ints,
    * the PLTE is their distinct colors in FIRST-APPEARANCE order (the
    * deterministic choice — no sort, no hash order), the raster stores
    * 1-byte palette indices, filters cycle like the other encoders (PNG
    * filters palette INDICES, not colors). More than 256 distinct colors
    * cannot be palette-encoded → null, like the fewer-than-one-row
    * degenerate. */
  def pngEncodePal(pixels: ArrayData, width: Int): Array[Byte] = {
    if (pixels == null) return null
    val height = pixels.numElements() / width
    if (height == 0) return null
    val n = width * height
    val raw = new Array[Byte](n)
    val index = new java.util.HashMap[Integer, Integer]()
    val order = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < n) {
      val p = pixels.getInt(i) & 0xFFFFFF
      var e = index.get(p)
      if (e == null) {
        if (order.length == 256) return null
        e = Integer.valueOf(order.length)
        index.put(p, e)
        order += p
      }
      raw(i) = e.intValue().toByte
      i += 1
    }
    val plte = new Array[Byte](3 * order.length)
    var j = 0
    while (j < order.length) {
      val p = order(j)
      plte(3 * j) = ((p >> 16) & 0xFF).toByte
      plte(3 * j + 1) = ((p >> 8) & 0xFF).toByte
      plte(3 * j + 2) = (p & 0xFF).toByte
      j += 1
    }
    pngContainer(raw, width, height, 1, 3, plte)
  }

  /** Pixel-count ceiling for PNG decode: a crafted IHDR must not drive a
    * multi-GB raster allocation before the (cheap) IDAT length check can
    * refute it — 2^26 gray8 pixels (64 MiB raster) is far above any real
    * thumbnail-pipeline input and bounds both allocations below. */
  private val PngMaxPixels = 1L << 26

  /** Parsed PNG container: geometry, color type, the UNFILTERED raster at
    * native bytes-per-pixel (1 for gray/palette, 3 for truecolor) and the
    * PLTE triples (palette images only). */
  private final class PngImage(val w: Int, val h: Int, val colorType: Int,
                               val bpp: Int, val raster: Array[Byte],
                               val plte: Array[Byte])

  /** Strict PNG parse → [[PngImage]], or null. Accepts 8-bit color types
    * 0 (grayscale), 2 (truecolor RGB) and 3 (palette). The whole
    * container must validate: exact 8-byte signature; chunk walk with
    * EVERY chunk's CRC32 verified; IHDR first (13 bytes, bit depth 8,
    * deflate compression, filter method 0, no interlace); for palette
    * images exactly one PLTE before the IDAT run, length divisible by 3
    * with 1..256 entries, every raster index inside the palette (PLTE on
    * a grayscale image, or a duplicate, rejects); IDAT chunks
    * consecutive, their concatenation inflating (real
    * `java.util.zip.Inflater` zlib) to EXACTLY height·(1+width·bpp)
    * bytes — truncated or oversized streams (decompression bombs)
    * reject; IEND last, empty, with NOTHING after it (same exact-length
    * contract as [[pgmGeometry]]); every scanline filter byte 0..4,
    * reconstructed per spec on the RECONSTRUCTED neighbors with
    * bpp-OFFSET left/upper-left references (the multi-byte-pixel rule:
    * for truecolor, "left" is the same channel 3 bytes back). Ancillary
    * chunks (e.g. tEXt, gAMA) are walked and CRC-checked but otherwise
    * ignored, per spec. Corrupt payloads return null, never crash the
    * scan. */
  private def pngParse(b: Array[Byte]): PngImage = {
    if (!isPng(b)) return null
    var off = 8L
    var w = 0; var h = 0; var colorType = -1
    var seenIhdr = false; var seenIend = false
    var idatStarted = false; var idatClosed = false
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (off < b.length) {
      if (seenIend) return null // trailing bytes after IEND
      if (off + 12 > b.length) return null
      val len = u32be(b, off.toInt)
      if (off + 12 + len > b.length) return null
      val to = off.toInt + 4
      val dataOff = off.toInt + 8
      val crc = new java.util.zip.CRC32
      crc.update(b, to, 4 + len.toInt)
      if (crc.getValue != u32be(b, dataOff + len.toInt)) return null
      if (!seenIhdr) {
        if (!tagAt(b, to, "IHDR") || len != 13L) return null
        val lw = u32be(b, dataOff); val lh = u32be(b, dataOff + 4)
        // bound each dimension BEFORE the product: u32 dims up to
        // 0xC0000000 would overflow the Long product past MaxValue and
        // wrap negative, sneaking past a product-only guard into a
        // wrapped toInt and a negative-size allocation
        if (lw <= 0 || lh <= 0 || lw > PngMaxPixels || lh > PngMaxPixels ||
            lw * lh > PngMaxPixels) return null
        colorType = b(dataOff + 9) & 0xFF
        if (b(dataOff + 8) != 8 ||   // bit depth
            (colorType != 0 && colorType != 2 && colorType != 3) ||
            b(dataOff + 10) != 0 ||  // compression: deflate
            b(dataOff + 11) != 0 ||  // filter method 0
            b(dataOff + 12) != 0)    // no Adam7 interlace
          return null
        w = lw.toInt; h = lh.toInt
        seenIhdr = true
      } else if (tagAt(b, to, "IHDR")) return null // duplicate IHDR
      else if (tagAt(b, to, "PLTE")) {
        // PLTE: palette images only (truecolor's suggested palette is
        // legal per spec but our encoder never emits one — and accepting
        // it would weaken the whole-container-validates classification),
        // exactly once, before any IDAT, 1..256 RGB triples
        if (colorType != 3 || plte != null || idatStarted) return null
        if (len == 0L || len % 3 != 0 || len > 768L) return null
        plte = java.util.Arrays.copyOfRange(b, dataOff, dataOff + len.toInt)
      } else if (tagAt(b, to, "IDAT")) {
        if (idatClosed) return null // IDAT chunks must be consecutive
        if (colorType == 3 && plte == null) return null // PLTE must precede
        idatStarted = true
        idat.write(b, dataOff, len.toInt)
      } else if (tagAt(b, to, "IEND")) {
        if (len != 0L || !idatStarted) return null
        seenIend = true
      } else {
        // ancillary chunk: CRC already verified, content ignored
        if (idatStarted) idatClosed = true
      }
      off += 12 + len
    }
    if (!seenIhdr || !seenIend) return null
    val bpp = if (colorType == 2) 3 else 1
    val rowBytes = w * bpp
    val filtered = new Array[Byte](h * (1 + rowBytes)) // ≤ 3·PngMaxPixels
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      val extra = new Array[Byte](1)
      var done = false
      while (!done) {
        if (got < filtered.length) {
          val n = inf.inflate(filtered, got, filtered.length - got)
          got += n
          if (inf.finished()) done = true
          else if (n == 0) return null // truncated / needs-dictionary
        } else {
          if (inf.inflate(extra, 0, 1) > 0) return null // oversized stream
          if (inf.finished()) done = true
          else return null // truncated before the zlib trailer
        }
      }
      if (got != filtered.length) return null
      // the zlib stream must also END the IDAT payload: garbage bytes
      // smuggled after the trailer would otherwise classify as valid
      // (the same exact-length contract as trailing-bytes-after-IEND)
      if (inf.getRemaining != 0) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    val raster = new Array[Byte](h * rowBytes)
    var r = 0
    while (r < h) {
      val f = filtered(r * (1 + rowBytes)) & 0xFF
      if (f > 4) return null
      var x = 0
      while (x < rowBytes) {
        val v = filtered(r * (1 + rowBytes) + 1 + x) & 0xFF
        val left = if (x >= bpp) raster(r * rowBytes + x - bpp) & 0xFF else 0
        val up = if (r > 0) raster((r - 1) * rowBytes + x) & 0xFF else 0
        val ul = if (x >= bpp && r > 0)
          raster((r - 1) * rowBytes + x - bpp) & 0xFF else 0
        val rec = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case _ => v + paeth(left, up, ul)
        }
        raster(r * rowBytes + x) = (rec & 0xFF).toByte
        x += 1
      }
      r += 1
    }
    if (colorType == 3) {
      // every index must dereference inside the palette — an
      // out-of-range index is a spec error, not a recoverable pixel
      val entries = plte.length / 3
      var i = 0
      while (i < raster.length) {
        if ((raster(i) & 0xFF) >= entries) return null
        i += 1
      }
    }
    new PngImage(w, h, colorType, bpp, raster, plte)
  }

  /** Gray8 view of a PNG ([[pngParse]] restricted to color type 0) —
    * the contract every EXISTING gray consumer (stats decode, values,
    * resize, dhash) keeps: color payloads are not silently luma-converted
    * into the grayscale feature path. */
  private def pngRaster(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    val p = pngParse(b)
    if (p == null || p.colorType != 0) null else (p.w, p.h, p.raster)
  }

  /** RGB view of a PNG: 3·w·h bytes row-major [r,g,b] — truecolor raster
    * in place, palette dereferenced through PLTE, grayscale replicated
    * across the three channels. Null when the container fails
    * [[pngParse]]. */
  private def pngRgbRaster(b: Array[Byte]): PngImage = {
    val p = pngParse(b)
    if (p == null) return null
    if (p.colorType == 2) return p
    val rgb = new Array[Byte](3 * p.w * p.h)
    var i = 0
    if (p.colorType == 3) {
      while (i < p.raster.length) {
        val e = (p.raster(i) & 0xFF) * 3
        rgb(3 * i) = p.plte(e); rgb(3 * i + 1) = p.plte(e + 1)
        rgb(3 * i + 2) = p.plte(e + 2)
        i += 1
      }
    } else {
      while (i < p.raster.length) {
        val v = p.raster(i)
        rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
        i += 1
      }
    }
    new PngImage(p.w, p.h, p.colorType, 3, rgb, p.plte)
  }

  /** Shared gray-pixel stats row over a CONTIGUOUS unpadded byte run —
    * the one accumulate-and-emit used by every unpadded raster decode
    * (PGM raster in place, PNG decoded raster), so the
    * n_values/NULL-stats contract lives in exactly one place. */
  private def grayStatsRow(format: UTF8String, width: Int, height: Int,
                           buf: Array[Byte], off: Int): InternalRow = {
    val n = width.toLong * height
    var sum = 0L
    var min = Long.MaxValue
    var max = Long.MinValue
    var i = 0
    while (i < n) {
      val v = (buf(off + i) & 0xFF).toLong
      sum += v
      if (v < min) min = v
      if (v > max) max = v
      i += 1
    }
    new GenericInternalRow(Array[Any](
      format, true, width, height, null, n,
      if (n > 0) sum else null, if (n > 0) min else null,
      if (n > 0) max else null))
  }

  private def decodePng(b: Array[Byte]): InternalRow = {
    val p = pngRaster(b)
    if (p == null) return invalid(FmtPng)
    grayStatsRow(FmtPng, p._1, p._2, p._3, 0)
  }

  /** [[decodeRgb]] output schema: per-channel sums + whole-image
    * min/max over all channel bytes. Integer domain throughout (the
    * grayscale [[Schema]] convention): `n_pixels` is 0, not NULL, for an
    * invalid payload so counts aggregate cleanly. */
  val RgbSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("valid", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true),
    StructField("min_val", LongType, nullable = true),
    StructField("max_val", LongType, nullable = true)))

  private val FmtPngGray = UTF8String.fromString("png-gray")
  private val FmtPngRgb = UTF8String.fromString("png-rgb")
  private val FmtPngPal = UTF8String.fromString("png-pal")

  /** Color decode → [[RgbSchema]] stats over the RGB view of a PNG
    * (truecolor raster in place, palette dereferenced, grayscale
    * replicated — [[pngRgbRaster]]). A wrong bpp-offset filter inverse or
    * a mis-indexed PLTE corrupts every later byte of the image, and the
    * per-channel integer sums catch it against a text-derived oracle. */
  def decodeRgb(bytes: Array[Byte]): InternalRow = {
    val p = if (bytes == null) null else pngRgbRaster(bytes)
    if (p == null)
      return new GenericInternalRow(Array[Any](
        FmtUnknown, false, null, null, 0L, null, null, null, null, null))
    val n = p.w.toLong * p.h
    var sr = 0L; var sg = 0L; var sb = 0L
    var mn = Long.MaxValue; var mx = Long.MinValue
    var i = 0
    while (i < n) {
      val r = (p.raster(3 * i) & 0xFF).toLong
      val g = (p.raster(3 * i + 1) & 0xFF).toLong
      val b = (p.raster(3 * i + 2) & 0xFF).toLong
      sr += r; sg += g; sb += b
      val lo = Math.min(r, Math.min(g, b)); val hi = Math.max(r, Math.max(g, b))
      if (lo < mn) mn = lo
      if (hi > mx) mx = hi
      i += 1
    }
    val fmt = p.colorType match {
      case 0 => FmtPngGray
      case 2 => FmtPngRgb
      case _ => FmtPngPal
    }
    new GenericInternalRow(Array[Any](
      fmt, true, p.w, p.h, n, sr, sg, sb,
      if (n > 0) mn else null, if (n > 0) mx else null))
  }

  /** Validated P5 geometry: (rasterOffset, width, height) or null.
    * Netpbm header tokenizer: after the magic, three whitespace-separated
    * decimal tokens (width, height, maxval) with `#`-to-end-of-line
    * comments allowed in any whitespace gap, then EXACTLY ONE whitespace
    * byte before the raster. Hardened like [[bmpGeometry]]: digit
    * accumulation caps at Int.MaxValue (a crafted 20-digit width must
    * not wrap), the raster bound is computed in LONG (w·h overflows
    * int), maxval outside 1..255 (multi-byte samples) rejects, and a
    * truncated raster rejects — corrupt payloads come back null, never
    * crash the scan. */
  private def pgmGeometry(b: Array[Byte]): Array[Int] = {
    if (b.length < 3 || b(0) != 'P'.toByte || b(1) != '5'.toByte) return null
    var off = 2
    def isWs(c: Byte): Boolean =
      c == ' '.toByte || c == '\t'.toByte || c == '\n'.toByte ||
        c == '\r'.toByte || c == 0x0b.toByte || c == 0x0c.toByte
    def nextInt(): Long = {
      var sawGap = false
      while (off < b.length &&
          (isWs(b(off)) || b(off) == '#'.toByte)) {
        if (b(off) == '#'.toByte) {
          while (off < b.length && b(off) != '\n'.toByte) off += 1
        } else off += 1
        sawGap = true
      }
      if (!sawGap || off >= b.length ||
          b(off) < '0'.toByte || b(off) > '9'.toByte) return -1L
      var v = 0L
      while (off < b.length && b(off) >= '0'.toByte && b(off) <= '9'.toByte) {
        v = v * 10 + (b(off) - '0'.toByte)
        if (v > Int.MaxValue) return -1L
        off += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    if (w <= 0 || h < 0 || maxv <= 0 || maxv > 255) return null
    if (off >= b.length || !isWs(b(off))) return null
    off += 1 // the single post-header whitespace byte
    // Exact-length contract: header + raster IS the container (pgmEncode
    // emits nothing after the raster). Rejecting trailing bytes keeps the
    // "whole container validates" classification honest — free text that
    // happens to start "P5 w h maxv " must stay "unknown".
    if (off.toLong + w * h != b.length) return null
    Array(off, w.toInt, h.toInt)
  }

  /** Unified gray-raster geometry — (dataOffset, width, height, stride,
    * topDown) for BMP (padded stride, row order per header sign) or P5
    * PGM (unpadded, always top-down); null when neither validates. The
    * single sniff+validate path shared by [[values]], [[resize]] and
    * [[dhash56]], so every raster consumer applies identical rules. */
  private def grayGeometry(b: Array[Byte]): Array[Int] = {
    if (b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte)
      return bmpGeometry(b)
    val g = pgmGeometry(b)
    if (g == null) null else Array(g(0), g(1), g(2), g(1), 1)
  }

  /** Sniff + parse: RIFF/WAVE → PCM16 stats, BM → 8-bit BMP pixel stats,
    * 8-byte PNG signature → gray8 PNG pixel stats, fully-valid P5 → PGM
    * pixel stats, anything else → ("unknown", valid=false). PGM
    * classification requires the whole container to validate (see
    * [[pgmGeometry]]) — free text starting with "P5" must stay
    * "unknown". The PNG signature contains 0x89 + control bytes, so it
    * cannot occur in text; sniff-by-signature with invalid-on-parse-fail
    * (the BMP convention) is safe there. */
  def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    if (tagAt(bytes, 0, "RIFF") && tagAt(bytes, 8, "WAVE")) decodeWav(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      decodeBmp(bytes)
    else if (isPng(bytes)) decodePng(bytes)
    else {
      val g = pgmGeometry(bytes)
      if (g != null) decodePgm(bytes, g) else invalid(FmtUnknown)
    }
  }

  private def decodePgm(b: Array[Byte], g: Array[Int]): InternalRow =
    grayStatsRow(FmtPgm, g(1), g(2), b, g(0)) // unpadded raster in place

  private def decodeWav(b: Array[Byte]): InternalRow = {
    val g = wavGeometry(b)
    if (g == null) return invalid(FmtWav)
    val rate = g(0); val dataOff = g(1); val n = g(2)
    var sum = 0L
    var min = Long.MaxValue
    var max = Long.MinValue
    var i = 0
    while (i < n) {
      val v = i16(b, dataOff + i * 2).toLong
      sum += v
      if (v < min) min = v
      if (v > max) max = v
      i += 1
    }
    new GenericInternalRow(Array[Any](
      FmtWav, true, null, null, rate, n.toLong,
      if (n > 0) sum else null, if (n > 0) min else null,
      if (n > 0) max else null))
  }

  /** Validated BMP geometry: (dataOffset, width, height, stride, topDown),
    * or null if the header fails 8-bit-uncompressed validation. Shared by
    * the stats decode, [[bmpValues]] and [[dhash56]] so every consumer
    * applies identical validation. */
  private def bmpGeometry(b: Array[Byte]): Array[Int] = {
    if (b.length < 54) return null
    val dataOffset = u32(b, 10)
    val biSize = u32(b, 14)
    val width = i32(b, 18)
    val rawHeight = i32(b, 22)
    val bpp = u16(b, 28)
    val compression = u32(b, 30)
    val height = Math.abs(rawHeight.toLong) // abs(Int.MinValue) would stay negative
    if (biSize < 40 || width <= 0 || bpp != 8 || compression != 0) return null
    // LONG stride/need: a crafted width near Int.MaxValue overflows the
    // int stride to negative, which would pass the bounds check and then
    // index the array at negative offsets — corrupt payloads must come
    // back invalid, never crash the scan
    val stride = (width.toLong + 3) & ~3L
    val need = dataOffset + stride * height
    if (dataOffset < 54 || need > b.length) return null
    // post-validation, everything fits in the array (and thus in Int)
    Array(dataOffset.toInt, width, height.toInt, stride.toInt,
      if (rawHeight < 0) 1 else 0)
  }

  private def decodeBmp(b: Array[Byte]): InternalRow = {
    // top-down files store height negative; row order never affects the
    // order-independent stats, so both orders share one scan
    val g = bmpGeometry(b)
    if (g == null) return invalid(FmtBmp)
    val dataOffset = g(0); val width = g(1); val height = g(2); val stride = g(3)
    val n = width.toLong * height
    var sum = 0L
    var min = Long.MaxValue
    var max = Long.MinValue
    var r = 0
    while (r < height) {
      val rowOff = dataOffset.toInt + r * stride
      var x = 0
      while (x < width) {
        val v = (b(rowOff + x) & 0xFF).toLong
        sum += v
        if (v < min) min = v
        if (v > max) max = v
        x += 1
      }
      r += 1
    }
    new GenericInternalRow(Array[Any](
      FmtBmp, true, width, height, null, n,
      if (n > 0) sum else null, if (n > 0) min else null,
      if (n > 0) max else null))
  }

  /** Validated WAV data location: (rate, dataOff, nSamples) or null —
    * the RIFF chunk-list walk (id(4) + LE-u32 size + payload, padded to
    * even) with `fmt ` validation (PCM, mono, 16-bit). Shared by the
    * stats decode, [[values]] and any frame-level consumer. */
  private def wavGeometry(b: Array[Byte]): Array[Int] = {
    // LONG cursor: a crafted u32 chunk size like 0xFFFFFFF8 would, as a
    // truncated int, step the cursor backwards (or not at all) and hang
    // the scan — corrupt payloads must come back invalid, never loop
    var off = 12L
    var fmtOk = false
    var rate = 0
    var dataOff = -1L
    var dataLen = -1L
    while (off + 8 <= b.length) {
      val size = u32(b, off.toInt + 4)
      val payload = off + 8
      if (tagAt(b, off.toInt, "fmt ")) {
        fmtOk = size >= 16 && payload + 16 <= b.length &&
          u16(b, payload.toInt) == 1 && u16(b, payload.toInt + 2) == 1 &&
          u16(b, payload.toInt + 14) == 16
        if (fmtOk) rate = u32(b, payload.toInt + 4).toInt
      } else if (tagAt(b, off.toInt, "data") && dataOff < 0) {
        dataOff = payload
        dataLen = size
      }
      off = payload + size + (size & 1) // strictly advances: size >= 0
    }
    if (!fmtOk || dataOff < 0 || dataLen < 0 ||
        dataOff + dataLen > b.length || (dataLen & 1) != 0) null
    else Array(rate, dataOff.toInt, (dataLen / 2).toInt)
  }

  /** Decoded value stream of a payload: WAV → PCM16 samples in file order,
    * BMP/PGM → pixel luminance row-major TOP-DOWN (the encoders' input
    * order, so values ∘ encode == identity on the array); invalid or
    * unknown payloads → null. Integer domain throughout —
    * oracle-replayable. */
  def values(b: Array[Byte]): ArrayData = {
    if (b == null) return null
    if (tagAt(b, 0, "RIFF") && tagAt(b, 8, "WAVE")) {
      val g = wavGeometry(b)
      if (g == null) return null
      val dataOff = g(1); val n = g(2)
      val out = new Array[Int](n)
      var i = 0
      while (i < n) { out(i) = i16(b, dataOff + i * 2).toInt; i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else if (isPng(b)) {
      val p = pngRaster(b)
      if (p == null) return null
      val raster = p._3
      val out = new Array[Int](raster.length)
      var i = 0
      while (i < raster.length) { out(i) = raster(i) & 0xFF; i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      val g = grayGeometry(b)
      if (g == null) return null
      val dataOffset = g(0); val width = g(1); val height = g(2)
      val stride = g(3); val topDown = g(4) == 1
      val out = new Array[Int](width * height)
      var r = 0
      while (r < height) {
        val fileRow = if (topDown) r else height - 1 - r
        val rowOff = dataOffset + fileRow * stride
        var x = 0
        while (x < width) { out(r * width + x) = b(rowOff + x) & 0xFF; x += 1 }
        r += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Nearest-neighbor resize of a gray-raster (BMP or PGM) payload onto
    * an `outW` × `outH` grid, fused with the decode (one header parse,
    * one output-pixel pass): out(r,c) = pix[(r·H)/outH][(c·W)/outW] —
    * the integer-exact downsample a thumbnail/feature pipeline runs
    * before embedding, and the same grid arithmetic [[dhash56]] samples
    * internally. Non-raster / invalid / zero-height payloads → null. */
  def resize(b: Array[Byte], outW: Int, outH: Int): ArrayData = {
    if (b == null) return null
    if (isPng(b)) {
      val p = pngRaster(b)
      if (p == null) return null
      return resizeRaster(p._3, 0, p._1, p._2, p._1, topDown = true,
        outW, outH)
    }
    val g = grayGeometry(b)
    if (g == null) return null
    if (g(2) == 0) return null
    resizeRaster(b, g(0), g(1), g(2), g(3), g(4) == 1, outW, outH)
  }

  private def resizeRaster(buf: Array[Byte], dataOffset: Int, width: Int,
                           height: Int, stride: Int, topDown: Boolean,
                           outW: Int, outH: Int): ArrayData = {
    val out = new Array[Int](outW * outH)
    var r = 0
    while (r < outH) {
      val srcRow = r * height / outH
      val fileRow = if (topDown) srcRow else height - 1 - srcRow
      val rowOff = dataOffset + fileRow * stride
      var c = 0
      while (c < outW) {
        out(r * outW + c) = buf(rowOff + c * width / outW) & 0xFF
        c += 1
      }
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** 56-bit perceptual difference-hash (dHash) of a gray-raster (BMP or
    * PGM) payload, fused
    * with the decode (ONE header parse + pixel pass per row — never a
    * per-bit re-decode): the image is nearest-neighbor sampled onto an
    * 8-row × 8-column grid `g(r,c) = pix[(r·H)/8][ (c·W)/8 ]` and bit
    * `r·7+c` (r in 0..7, c in 0..6) is set iff `g(r,c) < g(r,c+1)` — the
    * horizontal-gradient sign, robust to uniform brightness shifts. 56
    * bits (not the textbook 64) keeps the value exactly representable as
    * a non-negative BIGINT on every engine, so a SQL oracle can replay
    * it with integer shifts. Non-raster / invalid / zero-height payloads
    * → null. */
  def dhash56(b: Array[Byte]): java.lang.Long = {
    if (b == null) return null
    if (isPng(b)) {
      val p = pngRaster(b)
      if (p == null) return null
      return dhashRaster(p._3, 0, p._1, p._2, p._1, topDown = true)
    }
    val g = grayGeometry(b)
    if (g == null) return null
    if (g(2) == 0) return null
    dhashRaster(b, g(0), g(1), g(2), g(3), g(4) == 1)
  }

  private def dhashRaster(buf: Array[Byte], dataOffset: Int, width: Int,
                          height: Int, stride: Int,
                          topDown: Boolean): java.lang.Long = {
    def pix(r: Int, x: Int): Int = {
      val fileRow = if (topDown) r else height - 1 - r
      buf(dataOffset + fileRow * stride + x) & 0xFF
    }
    var bits = 0L
    var r = 0
    while (r < 8) {
      val row = r * height / 8
      var c = 0
      while (c < 7) {
        val left = pix(row, c * width / 8)
        val right = pix(row, (c + 1) * width / 8)
        if (left < right) bits |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    bits
  }
}

/** `wav_encode(samples array<int>)` → binary RIFF/WAVE PCM16 mono. */
case class WavEncode(child: Expression, rate: Int) extends UnaryExpression {
  require(rate > 0, s"sample rate must be positive, got $rate")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_encode"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.wavEncode(input.asInstanceOf[ArrayData], rate)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaCodecImpl.wavEncode($c, $rate);")

  override protected def withNewChildInternal(newChild: Expression): WavEncode =
    copy(child = newChild)
}

/** `bmp_encode(pixels array<int>)` → binary 8-bit grayscale BMP. */
case class BmpEncode(child: Expression, width: Int) extends UnaryExpression {
  require(width > 0, s"width must be positive, got $width")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bmp_encode"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.bmpEncode(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaCodecImpl.bmpEncode($c, $width);")

  override protected def withNewChildInternal(newChild: Expression): BmpEncode =
    copy(child = newChild)
}

/** `pgm_encode(pixels array<int>)` → binary Netpbm P5 graymap. */
case class PgmEncode(child: Expression, width: Int) extends UnaryExpression {
  require(width > 0, s"width must be positive, got $width")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pgm_encode"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.pgmEncode(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaCodecImpl.pgmEncode($c, $width);")

  override protected def withNewChildInternal(newChild: Expression): PgmEncode =
    copy(child = newChild)
}

/** `png_encode(pixels array<int>)` → binary 8-bit grayscale PNG (real
  * zlib-deflate IDAT; scanline filters cycle per row — see
  * [[MediaCodecImpl.pngEncode]]). Null for fewer pixels than one row. */
case class PngEncode(child: Expression, width: Int) extends UnaryExpression {
  require(width > 0, s"width must be positive, got $width")
  // fewer pixels than one full row yields null even for non-null input
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_encode"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.pngEncode(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MediaCodecImpl.pngEncode($c, $width);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PngEncode =
    copy(child = newChild)
}

/** `png_encode_rgb(pixels array<int>, width)` → binary truecolor PNG
  * (packed 0xRRGGBB pixels; see [[MediaCodecImpl.pngEncodeRgb]]). Null
  * for fewer pixels than one row. */
case class PngEncodeRgb(child: Expression, width: Int) extends UnaryExpression {
  require(width > 0, s"width must be positive, got $width")
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_encode_rgb"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.pngEncodeRgb(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MediaCodecImpl.pngEncodeRgb($c, $width);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PngEncodeRgb =
    copy(child = newChild)
}

/** `png_encode_pal(pixels array<int>, width)` → binary palette PNG
  * (packed 0xRRGGBB pixels, PLTE in first-appearance order; see
  * [[MediaCodecImpl.pngEncodePal]]). Null for fewer pixels than one row
  * or more than 256 distinct colors. */
case class PngEncodePal(child: Expression, width: Int) extends UnaryExpression {
  require(width > 0, s"width must be positive, got $width")
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_encode_pal"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.pngEncodePal(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MediaCodecImpl.pngEncodePal($c, $width);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PngEncodePal =
    copy(child = newChild)
}

/** `media_decode_rgb(payload binary)` → the [[MediaCodecImpl.RgbSchema]]
  * per-channel feature struct over any accepted PNG color type. NULL
  * payload propagates NULL. */
case class MediaDecodeRgb(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecImpl.RgbSchema
  override def prettyName: String = "media_decode_rgb"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.decodeRgb(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaCodecImpl.decodeRgb($c);")

  override protected def withNewChildInternal(newChild: Expression): MediaDecodeRgb =
    copy(child = newChild)
}

/** `media_decode(payload binary)` → the [[MediaCodecImpl.Schema]] feature
  * struct. NULL payload propagates NULL. */
case class MediaDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecImpl.Schema
  override def prettyName: String = "media_decode"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaCodecImpl.decode($c);")

  override protected def withNewChildInternal(newChild: Expression): MediaDecode =
    copy(child = newChild)
}

/** `media_values(payload binary)` → `array<int>`: WAV samples / BMP
  * top-down row-major pixels; null for invalid or unknown payloads. The
  * frame/grid consumers downstream reference the RESULT attribute, so the
  * container parses once per row however many features read it. */
case class MediaValues(child: Expression) extends UnaryExpression {
  // invalid/unknown payloads yield null even for a non-null child
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "media_values"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.values(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MediaCodecImpl.values($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MediaValues =
    copy(child = newChild)
}

/** `media_resize(payload binary)` → `array<int>` of outW×outH nearest-
  * neighbor-resized pixels (see [[MediaCodecImpl.resize]]); null for
  * non-BMP payloads. Fused decode+resize — one header parse, one
  * output-pixel pass, no intermediate full-pixel array. */
case class MediaResize(child: Expression, outW: Int, outH: Int)
    extends UnaryExpression {
  require(outW > 0 && outH > 0, s"resize dims must be positive: $outW x $outH")
  // non-BMP payloads yield null even for a non-null child
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "media_resize"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.resize(input.asInstanceOf[Array[Byte]], outW, outH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MediaCodecImpl.resize($c, $outW, $outH);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MediaResize =
    copy(child = newChild)
}

/** `media_dhash(payload binary)` → 56-bit perceptual difference-hash
  * (see [[MediaCodecImpl.dhash56]]); null for non-BMP payloads. Fused
  * decode+hash: one header parse and one pixel pass per row. */
case class MediaDHash(child: Expression) extends UnaryExpression {
  // invalid/unknown payloads yield null even for a non-null child
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "media_dhash"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.dhash56(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long ${ev.value}_box = graft.functions.MediaCodecImpl.dhash56($c);
         |${ev.isNull} = ${ev.value}_box == null;
         |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}_box.longValue();""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MediaDHash =
    copy(child = newChild)
}

/** `media_reel_dhash(payload binary)` → `array<long>` of per-frame
  * 56-bit dHashes of a stacked-BMP reel (see
  * [[MediaCodecImpl.reelDHashes]]); null for invalid/non-reel payloads.
  * Fused container walk + hash — one payload pass, frames never
  * materialize as an intermediate array. */
case class MediaReelDHash(child: Expression) extends UnaryExpression {
  // invalid/unknown payloads yield null even for a non-null child
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "media_reel_dhash"

  override protected def nullSafeEval(input: Any): Any =
    MediaCodecImpl.reelDHashes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MediaCodecImpl.reelDHashes($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MediaReelDHash =
    copy(child = newChild)
}

object MediaFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions
        .Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal, got $other")
  }

  /** Arity guard: a wrong-arg-count SQL call must raise the usage
    * message, never IndexOutOfBoundsException from `exprs(i)`. */
  private def arity(n: Int, fn: String)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$fn: expected $n arguments, got ${exprs.length}")
      build(exprs)
    }

  /** (name, implementing class, builder) for every media function — the
    * single source shared by session [[register]] and the
    * [[graft.GraftExtensions]] config-injection path (the class feeds
    * `DESCRIBE FUNCTION`'s ExpressionInfo). */
  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("media_decode", classOf[MediaDecode],
      arity(1, "media_decode(payload)")(exprs => MediaDecode(exprs.head))),
    ("media_values", classOf[MediaValues],
      arity(1, "media_values(payload)")(exprs => MediaValues(exprs.head))),
    ("media_dhash", classOf[MediaDHash],
      arity(1, "media_dhash(payload)")(exprs => MediaDHash(exprs.head))),
    ("media_reel_dhash", classOf[MediaReelDHash],
      arity(1, "media_reel_dhash(payload)")(exprs =>
        MediaReelDHash(exprs.head))),
    ("wav_encode", classOf[WavEncode],
      arity(2, "wav_encode(samples, rate)")(exprs =>
        WavEncode(exprs.head, intLit(exprs(1), "wav_encode(samples, rate)")))),
    ("bmp_encode", classOf[BmpEncode],
      arity(2, "bmp_encode(pixels, width)")(exprs =>
        BmpEncode(exprs.head, intLit(exprs(1), "bmp_encode(pixels, width)")))),
    ("pgm_encode", classOf[PgmEncode],
      arity(2, "pgm_encode(pixels, width)")(exprs =>
        PgmEncode(exprs.head, intLit(exprs(1), "pgm_encode(pixels, width)")))),
    ("png_encode", classOf[PngEncode],
      arity(2, "png_encode(pixels, width)")(exprs =>
        PngEncode(exprs.head, intLit(exprs(1), "png_encode(pixels, width)")))),
    ("png_encode_rgb", classOf[PngEncodeRgb],
      arity(2, "png_encode_rgb(pixels, width)")(exprs =>
        PngEncodeRgb(exprs.head,
          intLit(exprs(1), "png_encode_rgb(pixels, width)")))),
    ("png_encode_pal", classOf[PngEncodePal],
      arity(2, "png_encode_pal(pixels, width)")(exprs =>
        PngEncodePal(exprs.head,
          intLit(exprs(1), "png_encode_pal(pixels, width)")))),
    ("media_decode_rgb", classOf[MediaDecodeRgb],
      arity(1, "media_decode_rgb(payload)")(exprs =>
        MediaDecodeRgb(exprs.head))),
    ("media_resize", classOf[MediaResize],
      arity(3, "media_resize(payload, outW, outH)")(exprs =>
        MediaResize(exprs.head,
          intLit(exprs(1), "media_resize(payload, outW, outH)"),
          intLit(exprs(2), "media_resize(payload, outW, outH)")))))

  /** Idempotent session registration (same pattern as [[VectorFunctions]]). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, build) =>
      if (!registry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, build, "scala_udf")
    }
  }

  /** Column-API handles; require [[register]] on the session first. */
  def media_decode(payload: Column): Column =
    org.apache.spark.sql.functions.call_function("media_decode", payload)
  def wav_encode(samples: Column, rate: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "wav_encode", samples, org.apache.spark.sql.functions.lit(rate))
  def bmp_encode(pixels: Column, width: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "bmp_encode", pixels, org.apache.spark.sql.functions.lit(width))
  def pgm_encode(pixels: Column, width: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "pgm_encode", pixels, org.apache.spark.sql.functions.lit(width))
  def png_encode(pixels: Column, width: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "png_encode", pixels, org.apache.spark.sql.functions.lit(width))
  def png_encode_rgb(pixels: Column, width: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "png_encode_rgb", pixels, org.apache.spark.sql.functions.lit(width))
  def png_encode_pal(pixels: Column, width: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "png_encode_pal", pixels, org.apache.spark.sql.functions.lit(width))
  def media_decode_rgb(payload: Column): Column =
    org.apache.spark.sql.functions.call_function("media_decode_rgb", payload)
  def media_values(payload: Column): Column =
    org.apache.spark.sql.functions.call_function("media_values", payload)
  def media_dhash(payload: Column): Column =
    org.apache.spark.sql.functions.call_function("media_dhash", payload)
  def media_reel_dhash(payload: Column): Column =
    org.apache.spark.sql.functions.call_function("media_reel_dhash", payload)
  def media_resize(payload: Column, outW: Int, outH: Int): Column =
    org.apache.spark.sql.functions.call_function("media_resize", payload,
      org.apache.spark.sql.functions.lit(outW),
      org.apache.spark.sql.functions.lit(outH))
}
