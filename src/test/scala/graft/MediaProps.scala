package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.MediaCodecImpl

/** Property-based parity for the media codec: for ANY pixel/sample
  * content at any geometry, encode→decode round-trips the values,
  * and the fused dhash/resize expressions agree with straight-from-the-
  * definition references computed on the raw pixels. Pure-JVM (no Spark
  * session): the expressions delegate to these same impl methods, whose
  * Spark-side wiring MediaCodecSpec covers. */
object MediaProps extends Properties("MediaCodec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val pixel = Gen.choose(0, 255)
  private val img = for {
    w <- Gen.choose(1, 9)
    h <- Gen.choose(1, 9)
    px <- Gen.listOfN(w * h, pixel)
  } yield (w, h, px)

  private val pcm = Gen.choose(0, 40)
    .flatMap(n => Gen.listOfN(n, Gen.choose(-32768, 32767)))

  property("WAV values ∘ encode == identity for any PCM content") =
    forAll(pcm) { samples =>
      val bytes = MediaCodecImpl.wavEncode(
        ArrayData.toArrayData(samples.toArray), 8000)
      val got = MediaCodecImpl.values(bytes)
      got != null && got.toIntArray().toSeq == samples
    }

  property("BMP values ∘ encode == identity for any geometry (incl. stride pad)") =
    forAll(img) { case (w, h, px) =>
      val bytes = MediaCodecImpl.bmpEncode(ArrayData.toArrayData(px.toArray), w)
      val got = MediaCodecImpl.values(bytes)
      got != null && got.toIntArray().toSeq == px
    }

  property("dhash56 equals the definition on raw pixels") =
    forAll(img) { case (w, h, px) =>
      val bytes = MediaCodecImpl.bmpEncode(ArrayData.toArrayData(px.toArray), w)
      def g(r: Int, c: Int): Int = px((r * h / 8) * w + (c * w / 8))
      val want = (for (r <- 0 until 8; c <- 0 until 7 if g(r, c) < g(r, c + 1))
        yield 1L << (r * 7 + c)).foldLeft(0L)(_ | _)
      MediaCodecImpl.dhash56(bytes) == want
    }

  property("resize equals the nearest-neighbor definition at any target dims") =
    forAll(img, Gen.choose(1, 6), Gen.choose(1, 6)) {
      case ((w, h, px), ow, oh) =>
        val bytes = MediaCodecImpl.bmpEncode(ArrayData.toArrayData(px.toArray), w)
        val want = for (r <- 0 until oh; c <- 0 until ow)
          yield px((r * h / oh) * w + (c * w / ow))
        val got = MediaCodecImpl.resize(bytes, ow, oh)
        got != null && got.toIntArray().toSeq == want
    }

  property("dhash is invariant under any brightness shift that avoids clipping") =
    forAll(img, Gen.choose(1, 60)) { case ((w, h, px), shift) =>
      val lo = px.map(p => p * 195 / 255) // compress into [0, 195]
      val hi = lo.map(_ + shift)
      val a = MediaCodecImpl.dhash56(
        MediaCodecImpl.bmpEncode(ArrayData.toArrayData(lo.toArray), w))
      val b = MediaCodecImpl.dhash56(
        MediaCodecImpl.bmpEncode(ArrayData.toArrayData(hi.toArray), w))
      a == b
    }

  property("PGM values ∘ encode == identity; dhash container-independent") =
    forAll(img) { case (w, h, px) =>
      val bytes = MediaCodecImpl.pgmEncode(ArrayData.toArrayData(px.toArray), w)
      val got = MediaCodecImpl.values(bytes)
      val viaBmp = MediaCodecImpl.dhash56(
        MediaCodecImpl.bmpEncode(ArrayData.toArrayData(px.toArray), w))
      got != null && got.toIntArray().toSeq == px &&
        MediaCodecImpl.dhash56(bytes) == viaBmp
    }

  property("reel: per-frame dhash identity for any frame stack; cuts never crash") =
    forAll(Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, img))) { frames =>
      val blobs = frames.map { case (w, _, px) =>
        MediaCodecImpl.bmpEncode(ArrayData.toArrayData(px.toArray), w)
      }
      val reel = blobs.reduce(_ ++ _)
      val got = MediaCodecImpl.reelDHashes(reel)
      val want = blobs.map(MediaCodecImpl.dhash56(_).longValue())
      got != null && got.toLongArray().toSeq == want &&
        // any strict prefix truncation invalidates the whole reel
        MediaCodecImpl.reelDHashes(reel.dropRight(1 + reel.length % 7)) == null
    }

  private val rgbImg = for {
    w <- Gen.choose(1, 9)
    h <- Gen.choose(1, 9)
    px <- Gen.listOfN(w * h, Gen.choose(0, 0xFFFFFF))
  } yield (w, h, px)

  property("color PNG: per-channel stats identity through truecolor AND " +
      "palette encodes for any pixel content") =
    forAll(rgbImg) { case (w, h, px) =>
      def chSums(p: Seq[Int]): (Long, Long, Long, Long, Long) = {
        val r = p.map(x => ((x >> 16) & 0xFF).toLong)
        val g = p.map(x => ((x >> 8) & 0xFF).toLong)
        val b = p.map(x => (x & 0xFF).toLong)
        val all = r ++ g ++ b
        (r.sum, g.sum, b.sum, all.min, all.max)
      }
      val want = chSums(px)
      def check(bytes: Array[Byte], fmt: String): Boolean = {
        val row = MediaCodecImpl.decodeRgb(bytes)
        row.getUTF8String(0).toString == fmt && row.getBoolean(1) &&
          row.getInt(2) == w && row.getInt(3) == h &&
          (row.getLong(5), row.getLong(6), row.getLong(7),
            row.getLong(8), row.getLong(9)) ==
            ((want._1, want._2, want._3, want._4, want._5))
      }
      val arr = ArrayData.toArrayData(px.toArray)
      // ≤ 81 pixels → ≤ 81 distinct colors: palette always encodable
      check(MediaCodecImpl.pngEncodeRgb(arr, w), "png-rgb") &&
        check(MediaCodecImpl.pngEncodePal(arr, w), "png-pal")
    }

  property("PGM header fuzz: arbitrary bytes after the magic never crash") =
    forAll(Gen.choose(0, 64).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(Gen.choose(0, 255),
          Gen.oneOf(' ', '\n', '#', '0', '5', '9').map(_.toInt))))) { tail =>
      val bytes = "P5".getBytes("US-ASCII") ++ tail.map(_.toByte).toArray
      // must return a row (valid pgm or unknown), never throw / hang
      val row = MediaCodecImpl.decode(bytes)
      val vals = MediaCodecImpl.values(bytes)
      val rs = MediaCodecImpl.resize(bytes, 2, 2)
      val dh = MediaCodecImpl.dhash56(bytes)
      row != null &&
        (row.getUTF8String(0).toString == "pgm") == row.getBoolean(1) &&
        // consumers agree on validity
        (vals != null) == row.getBoolean(1) &&
        ((rs == null) || row.getBoolean(1)) && ((dh == null) || row.getBoolean(1))
    }
}
