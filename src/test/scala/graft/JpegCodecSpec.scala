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
}
