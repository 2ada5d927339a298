package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JpegCodecImpl

/** The JPEG codec's contracts: geometry-exact lossy roundtrip inside the
  * published tolerance bands, deterministic encode at fixed quality, and
  * corrupt payloads rejected without crashing — the shared codec rules,
  * minus bit-exactness (JPEG is lossy by construction; the query's
  * differential uses tolerance booleans, the sketch-approx pattern). */
class JpegCodecSpec extends AnyFunSuite {

  private def arr(xs: Seq[Int]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs.toArray)

  private val pix35 = (0 until 35).map(i => (i * 53 + 11) % 256)

  test("lossy roundtrip: exact geometry, pixels inside the published bands") {
    val b = JpegCodecImpl.encodeGray(arr(pix35), 7, MediaQueries.JpegQuality)
    assert(b != null && b.length > 2)
    val row = JpegCodecImpl.decode(b)
    assert(row.getUTF8String(0).toString == "jpeg" && row.getBoolean(1))
    assert(row.getInt(2) == 7 && row.getInt(3) == 5 && row.getLong(4) == 35L)
    val mean = row.getLong(5).toDouble / 35
    val srcMean = pix35.sum.toDouble / 35
    assert(math.abs(mean - srcMean) <= MediaQueries.JpegMeanTol,
      s"mean drift ${math.abs(mean - srcMean)}")
    val dec = row.getArray(8)
    assert(dec != null && dec.numElements() == 35)
    val maxErr = (0 until 35)
      .map(i => math.abs(dec.getInt(i) - pix35(i))).max
    assert(maxErr <= MediaQueries.JpegPixTol, s"pixel err $maxErr")
  }

  test("encode is deterministic at fixed quality") {
    val a = JpegCodecImpl.encodeGray(arr(pix35), 7, 90)
    val b = JpegCodecImpl.encodeGray(arr(pix35), 7, 90)
    assert(java.util.Arrays.equals(a, b))
  }

  test("degenerate and corrupt payloads reject, never crash") {
    // fewer pixels than one row: no 0-height image
    assert(JpegCodecImpl.encodeGray(arr(Seq(1, 2, 3)), 7, 90) == null)
    val good = JpegCodecImpl.encodeGray(arr(pix35), 7, 90)
    val truncated = good.take(good.length / 2)
    val rowT = JpegCodecImpl.decode(truncated)
    assert(rowT.getUTF8String(0).toString == "jpeg" && !rowT.getBoolean(1))
    assert(rowT.getLong(4) == 0L && rowT.isNullAt(8))
    // non-JPEG bytes: sniffed unknown, invalid
    val rowU = JpegCodecImpl.decode("plain text".getBytes("UTF-8"))
    assert(rowU.getUTF8String(0).toString == "unknown" && !rowU.getBoolean(1))
    // flipped interior bytes: either a decoder-salvaged valid image or a
    // clean rejection — never an exception
    val flipped = good.clone()
    flipped(good.length / 2) = (flipped(good.length / 2) ^ 0x7F).toByte
    val rowF = JpegCodecImpl.decode(flipped)
    assert(rowF != null)
  }

  private val rgb35 = (0 until 35).map { i =>
    val c = (i * 53 + 11) % 256
    (c << 16) | (((c * 3 + 7) % 256) << 8) | ((c * 5 + 11) % 256)
  }

  private def lumaOf(p: Int): Int =
    (((p >>> 16) & 255) * 299 + ((p >>> 8) & 255) * 587 +
      (p & 255) * 114) / 1000

  test("color roundtrip: exact geometry, per-channel means and luma in band") {
    val b = JpegCodecImpl.encodeRgb(arr(rgb35), 7, MediaQueries.JpegQuality)
    assert(b != null && b.length > 2)
    val row = JpegCodecImpl.decodeRgb(b)
    assert(row.getUTF8String(0).toString == "jpeg" && row.getBoolean(1))
    assert(row.getInt(2) == 7 && row.getInt(3) == 5 && row.getLong(4) == 35L)
    def srcMean(shift: Int) =
      rgb35.map(p => (p >>> shift) & 255).sum.toDouble / 35
    assert(math.abs(row.getLong(5).toDouble / 35 - srcMean(16))
      <= MediaQueries.JpegRgbMeanTol, "r mean")
    assert(math.abs(row.getLong(6).toDouble / 35 - srcMean(8))
      <= MediaQueries.JpegRgbMeanTol, "g mean")
    assert(math.abs(row.getLong(7).toDouble / 35 - srcMean(0))
      <= MediaQueries.JpegRgbMeanTol, "b mean")
    val dec = row.getArray(8)
    assert(dec != null && dec.numElements() == 35)
    val maxLumaErr = (0 until 35)
      .map(i => math.abs(lumaOf(dec.getInt(i)) - lumaOf(rgb35(i)))).max
    assert(maxLumaErr <= MediaQueries.JpegRgbLumaTol, s"luma err $maxLumaErr")
    // stored pixels carry no alpha byte: the packed-0xRRGGBB contract
    assert((0 until 35).forall(i => (dec.getInt(i) & 0xFF000000) == 0))
  }

  test("color encode is deterministic at fixed quality") {
    val a = JpegCodecImpl.encodeRgb(arr(rgb35), 7, 90)
    val b = JpegCodecImpl.encodeRgb(arr(rgb35), 7, 90)
    assert(java.util.Arrays.equals(a, b))
  }

  test("color corrupt/degenerate payloads reject, never crash") {
    assert(JpegCodecImpl.encodeRgb(arr(Seq(1, 2, 3)), 7, 90) == null)
    val good = JpegCodecImpl.encodeRgb(arr(rgb35), 7, 90)
    val rowT = JpegCodecImpl.decodeRgb(good.take(good.length / 2))
    assert(rowT.getUTF8String(0).toString == "jpeg" && !rowT.getBoolean(1))
    assert(rowT.getLong(4) == 0L && rowT.isNullAt(8))
    val rowU = JpegCodecImpl.decodeRgb("plain text".getBytes("UTF-8"))
    assert(rowU.getUTF8String(0).toString == "unknown" && !rowU.getBoolean(1))
  }

  test("gray decode rejects a color JPEG; color decode replicates gray") {
    // a 3-band YCbCr image is not "valid grayscale" — the band guard
    val color = JpegCodecImpl.encodeRgb(arr(rgb35), 7, 90)
    val asGray = JpegCodecImpl.decode(color)
    assert(asGray.getUTF8String(0).toString == "jpeg" && !asGray.getBoolean(1))
    // the rgb view of a 1-band gray JPEG replicates the gray value
    val gray = JpegCodecImpl.encodeGray(arr(pix35), 7, 90)
    val asRgb = JpegCodecImpl.decodeRgb(gray)
    assert(asRgb.getBoolean(1))
    val dec = asRgb.getArray(8)
    assert((0 until 35).forall { i =>
      val p = dec.getInt(i)
      val r = (p >>> 16) & 255; val g = (p >>> 8) & 255; val b = p & 255
      r == g && g == b
    })
  }
}
