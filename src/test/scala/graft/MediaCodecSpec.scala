package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.Multimodal
import graft.functions.MediaFunctions

/** The pure-JVM WAV/BMP codec: round-trips, real container-layout quirks
  * (RIFF chunk walking with pad bytes, BMP row stride and bottom-up /
  * top-down order), and rejection of corrupt payloads. */
class MediaCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def decodeBytes(payloads: Seq[Array[Byte]]) = {
    MediaFunctions.register(spark)
    import MediaFunctions.media_decode
    payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "payload")
      .select($"id", media_decode($"payload").as("m"))
      .orderBy("id")
      .select($"id", $"m.format", $"m.valid", $"m.width", $"m.height",
        $"m.sample_rate", $"m.n_values", $"m.sum_val", $"m.min_val", $"m.max_val")
      .collect()
  }

  test("WAV round-trip: header, rate, signed LE samples incl. extremes") {
    MediaFunctions.register(spark)
    import MediaFunctions.{media_decode, wav_encode}
    val samples = Seq(0, 1, -1, 32767, -32768, 1000, -999)
    val row = Seq(Tuple1(samples)).toDF("s")
      .select(media_decode(wav_encode($"s", 44100)).as("m"))
      .select($"m.format", $"m.valid", $"m.sample_rate", $"m.n_values",
        $"m.sum_val", $"m.min_val", $"m.max_val")
      .head()
    assert(row.getString(0) == "wav" && row.getBoolean(1))
    assert(row.getInt(2) == 44100)
    assert(row.getLong(3) == samples.length.toLong)
    assert(row.getLong(4) == samples.map(_.toLong).sum)
    assert(row.getLong(5) == -32768L && row.getLong(6) == 32767L)
  }

  test("WAV chunk walking: a LIST chunk with odd size (pad byte) before data") {
    // Hand-assemble: RIFF [LIST(3 bytes + pad)] [fmt ] [data], so a decoder
    // that assumes fmt-at-12/data-at-36 fails but a real chunk walker works.
    val samples = Seq(5, -7, 300)
    val canonical = graft.functions.MediaCodecImpl.wavEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(samples.toArray),
      8000)
    val fmtChunk = canonical.slice(12, 36) // "fmt " + 16 + payload
    val dataChunk = canonical.slice(36, canonical.length)
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0) // pad to 4
    val body = list ++ fmtChunk ++ dataChunk
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes); out.write(Array[Byte](
      ((body.length + 4) & 0xFF).toByte, (((body.length + 4) >> 8) & 0xFF).toByte, 0, 0))
    out.write("WAVE".getBytes); out.write(body)
    val got = decodeBytes(Seq(out.toByteArray)).head
    assert(got.getString(1) == "wav" && got.getBoolean(2))
    assert(got.getLong(6) == 3L)
    assert(got.getLong(7) == samples.map(_.toLong).sum)
  }

  test("BMP round-trip: stride padding at width 7, bottom-up rows") {
    MediaFunctions.register(spark)
    import MediaFunctions.{bmp_encode, media_decode}
    val pixels = (0 until 21).map(i => (i * 11) % 256) // 3 rows of 7
    val row = Seq(Tuple1(pixels)).toDF("p")
      .select(media_decode(bmp_encode($"p", 7)).as("m"))
      .select($"m.format", $"m.valid", $"m.width", $"m.height",
        $"m.n_values", $"m.sum_val", $"m.min_val", $"m.max_val")
      .head()
    assert(row.getString(0) == "bmp" && row.getBoolean(1))
    assert(row.getInt(2) == 7 && row.getInt(3) == 3)
    assert(row.getLong(4) == 21L)
    assert(row.getLong(5) == pixels.map(_.toLong).sum)
    assert(row.getLong(6) == pixels.min.toLong && row.getLong(7) == pixels.max.toLong)
  }

  test("BMP top-down (negative height) decodes to the same stats") {
    val pixels = (0 until 14).map(i => i * 3)
    val bu = graft.functions.MediaCodecImpl.bmpEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(pixels.toArray), 7)
    val td = bu.clone()
    // height i32 LE at offset 22 -> negate (two rows -> -2)
    val h = -2
    td(22) = (h & 0xFF).toByte; td(23) = ((h >> 8) & 0xFF).toByte
    td(24) = ((h >> 16) & 0xFF).toByte; td(25) = ((h >> 24) & 0xFF).toByte
    val Seq(a, b) = decodeBytes(Seq(bu, td)).toSeq
    assert(a.getBoolean(2) && b.getBoolean(2))
    assert(a.getLong(6) == b.getLong(6) && a.getLong(7) == b.getLong(7))
    assert(b.getInt(4) == 2) // |height|
  }

  test("corrupt payloads: bad magic, truncated data, unsupported bpp") {
    val goodWav = graft.functions.MediaCodecImpl.wavEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1, 2, 3)), 8000)
    val truncated = goodWav.slice(0, goodWav.length - 2) // data chunk short
    val goodBmp = graft.functions.MediaCodecImpl.bmpEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1, 2, 3, 4, 5, 6, 7)), 7)
    val bpp24 = goodBmp.clone(); bpp24(28) = 24
    val garbage = "just some text".getBytes
    val got = decodeBytes(Seq(truncated, bpp24, garbage))
    assert(got(0).getString(1) == "wav" && !got(0).getBoolean(2))
    assert(got(1).getString(1) == "bmp" && !got(1).getBoolean(2))
    assert(got(2).getString(1) == "unknown" && !got(2).getBoolean(2))
    assert(got.forall(_.getLong(6) == 0L)) // n_values 0, not null
  }

  test("crafted payloads terminate as invalid: backward chunk step, overflowing width") {
    // RIFF chunk with u32 size 0xFFFFFFF8: as a truncated int the cursor
    // would step backwards and the chunk walk would never terminate
    val loopWav = new java.io.ByteArrayOutputStream()
    loopWav.write("RIFF".getBytes); loopWav.write(Array[Byte](64, 0, 0, 0))
    loopWav.write("WAVE".getBytes)
    loopWav.write("JUNK".getBytes)
    loopWav.write(Array[Byte](-8, -1, -1, -1)) // 0xFFFFFFF8 LE
    loopWav.write(Array.fill[Byte](16)(0))
    // BMP width 0x7FFFFFFE: int stride would overflow negative and pass
    // the bounds check, then index the array at negative offsets
    val hugeBmp = graft.functions.MediaCodecImpl.bmpEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(1, 2, 3, 4, 5, 6, 7)), 7)
    val w = 0x7FFFFFFE
    hugeBmp(18) = (w & 0xFF).toByte; hugeBmp(19) = ((w >> 8) & 0xFF).toByte
    hugeBmp(20) = ((w >> 16) & 0xFF).toByte; hugeBmp(21) = ((w >> 24) & 0xFF).toByte
    val got = decodeBytes(Seq(loopWav.toByteArray, hugeBmp))
    assert(got(0).getString(1) == "wav" && !got(0).getBoolean(2))
    assert(got(1).getString(1) == "bmp" && !got(1).getBoolean(2))
    assert(graft.functions.MediaCodecImpl.values(loopWav.toByteArray) == null)
    assert(graft.functions.MediaCodecImpl.values(hugeBmp) == null)
    assert(graft.functions.MediaCodecImpl.dhash56(hugeBmp) == null)
    assert(graft.functions.MediaCodecImpl.resize(hugeBmp, 4, 4) == null)
  }

  test("media_values: values ∘ encode == identity for WAV and both BMP orders") {
    MediaFunctions.register(spark)
    import MediaFunctions.media_values
    val samples = Seq(0, 1, -1, 32767, -32768, 1000, -999)
    val wav = graft.functions.MediaCodecImpl.wavEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(samples.toArray), 8000)
    val pixels = (0 until 21).map(i => (i * 11) % 256)
    val bu = graft.functions.MediaCodecImpl.bmpEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(pixels.toArray), 7)
    // top-down twin: negate height AND reverse file row order so the
    // logical (top-down) pixel stream is unchanged
    val td = bu.clone()
    val h = -3
    td(22) = (h & 0xFF).toByte; td(23) = ((h >> 8) & 0xFF).toByte
    td(24) = ((h >> 16) & 0xFF).toByte; td(25) = ((h >> 24) & 0xFF).toByte
    val dataOffset = 14 + 40 + 256 * 4
    val stride = 8 // width 7 padded to 4-byte multiple
    for (r <- 0 until 3; x <- 0 until stride)
      td(dataOffset + r * stride + x) = bu(dataOffset + (2 - r) * stride + x)
    val got = Seq((0L, wav), (1L, bu), (2L, td), (3L, "garbage".getBytes))
      .toDF("id", "payload")
      .select($"id", media_values($"payload").as("v")).orderBy("id")
      .collect()
    assert(got(0).getSeq[Int](1) == samples)
    assert(got(1).getSeq[Int](1) == pixels)
    assert(got(2).getSeq[Int](1) == pixels) // order-normalized
    assert(got(3).isNullAt(1))
  }

  /** Independent dHash reference: straight from the definition. */
  private def dhashRef(pix: Seq[Int], w: Int): Long = {
    val h = pix.length / w
    def g(r: Int, c: Int): Int = pix((r * h / 8) * w + (c * w / 8))
    (for (r <- 0 until 8; c <- 0 until 7 if g(r, c) < g(r, c + 1))
      yield 1L << (r * 7 + c)).foldLeft(0L)(_ | _)
  }

  test("media_dhash matches the definition and is brightness-shift invariant") {
    MediaFunctions.register(spark)
    import MediaFunctions.media_dhash
    def bmp(pix: Seq[Int], w: Int) = graft.functions.MediaCodecImpl.bmpEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(pix.toArray), w)
    val img = (0 until 63).map(i => (i * 37 + 11) % 200) // 9 rows of 7, <200
    val shifted = img.map(_ + 55)                        // +55 keeps <=255
    val wav = graft.functions.MediaCodecImpl.wavEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1, 2)), 8000)
    val got = Seq((0L, bmp(img, 7)), (1L, bmp(shifted, 7)),
        (2L, bmp(img.take(14), 7)), (3L, wav))
      .toDF("id", "payload")
      .select($"id", media_dhash($"payload").as("h")).orderBy("id").collect()
    assert(got(0).getLong(1) == dhashRef(img, 7))
    assert(got(1).getLong(1) == got(0).getLong(1)) // gradient signs unchanged
    assert(got(2).getLong(1) == dhashRef(img.take(14), 7))
    assert(got(3).isNullAt(1)) // WAV payloads never image-hash
  }

  test("media_resize matches the nearest-neighbor definition") {
    MediaFunctions.register(spark)
    import MediaFunctions.media_resize
    val pix = (0 until 63).map(i => (i * 29 + 5) % 256) // 9 rows of 7
    val bmp = graft.functions.MediaCodecImpl.bmpEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(pix.toArray), 7)
    val got = Seq(Tuple1(bmp)).toDF("payload")
      .select(media_resize($"payload", 4, 4).as("px"))
      .head().getSeq[Int](0)
    val want = for (r <- 0 until 4; c <- 0 until 4)
      yield pix((r * 9 / 4) * 7 + (c * 7 / 4))
    assert(got == want)
    // WAV payloads never resize
    val wav = graft.functions.MediaCodecImpl.wavEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1)), 8000)
    assert(Seq(Tuple1(wav)).toDF("payload")
      .select(media_resize($"payload", 4, 4)).head().isNullAt(0))
  }

  test("PGM round-trip: header, dims, stats, values order; dhash matches BMP") {
    MediaFunctions.register(spark)
    import MediaFunctions.{bmp_encode, media_dhash, media_values, pgm_encode}
    val pix = (0 until 65).map(i => (i * 37 + 11) % 256) // 9 full rows of 7 + tail 2
    val row = Seq(Tuple1(pix)).toDF("p")
      .select(media_values(pgm_encode($"p", 7)).as("v"),
        media_dhash(pgm_encode($"p", 7)).as("hp"),
        media_dhash(bmp_encode(slice($"p", 1, 63), 7)).as("hb"))
      .head()
    assert(row.getSeq[Int](0) == pix.take(63)) // tail past last full row dropped
    assert(!row.isNullAt(1) && row.getLong(1) == row.getLong(2)) // container-independent hash
    val st = decodeBytes(Seq(graft.functions.MediaCodecImpl.pgmEncode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(pix.toArray), 7))).head
    assert(st.getString(1) == "pgm" && st.getBoolean(2))
    assert(st.getInt(3) == 7 && st.getInt(4) == 9 && st.isNullAt(5))
    assert(st.getLong(6) == 63L && st.getLong(7) == pix.take(63).map(_.toLong).sum)
    assert(st.getLong(8) == pix.take(63).min.toLong &&
      st.getLong(9) == pix.take(63).max.toLong)
  }

  test("PGM header tokenizer: comments, arbitrary whitespace, crafted rejects") {
    def pgm(header: String, raster: Seq[Int]): Array[Byte] =
      header.getBytes("US-ASCII") ++ raster.map(_.toByte).toArray
    val ras = (0 until 6).map(i => i * 10)
    // comments in every gap + mixed whitespace still parse
    val good = pgm("P5 # c1\n\t3 # c2\n 2\r# c3\n255\n", ras)
    val g = decodeBytes(Seq(good)).head
    assert(g.getString(1) == "pgm" && g.getBoolean(2))
    assert(g.getInt(3) == 3 && g.getInt(4) == 2)
    assert(g.getLong(6) == 6L && g.getLong(7) == ras.map(_.toLong).sum)
    // crafted payloads must come back invalid/unknown, never crash:
    val rejects = Seq(
      pgm("P5\n3 2\n255\n", ras.take(5)),          // truncated raster
      pgm("P5\n3 2\n65535\n", ras ++ ras),          // multi-byte samples
      pgm("P5\n99999999999999999999 2\n255\n", ras), // overflowing width
      pgm("P5\n-3 2\n255\n", ras),                  // negative width
      pgm("P5\n3 2\n255", Seq.empty),               // missing raster separator
      pgm("P53 2 255\n", ras),                      // no gap after magic
      "P5 this is just text that starts with the magic".getBytes("US-ASCII"))
    decodeBytes(rejects).foreach { r =>
      assert(r.getString(1) == "unknown" && !r.getBoolean(2), r.toString)
    }
    // zero-height is a VALID (empty) raster, like BMP
    val empty = decodeBytes(Seq(pgm("P5\n3 0\n255\n", Seq.empty))).head
    assert(empty.getString(1) == "pgm" && empty.getBoolean(2) &&
      empty.getLong(6) == 0L && empty.isNullAt(7))
  }

  test("reel walk: per-frame hashes == dhash56 of each frame; corrupt reels null") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val impl = graft.functions.MediaCodecImpl
    def bmp(px: Seq[Int], w: Int) = impl.bmpEncode(ArrayData.toArrayData(px.toArray), w)
    val f1 = bmp((0 until 21).map(i => i * 11 % 256), 7)
    val f2 = bmp((0 until 35).map(i => (i * 7 + 3) % 256), 7) // different geometry
    val f3 = bmp((0 until 21).map(i => 255 - i), 7)
    val reel = f1 ++ f2 ++ f3
    val got = impl.reelDHashes(reel)
    assert(got != null && got.numElements() == 3)
    assert((0 until 3).map(got.getLong) ==
      Seq(f1, f2, f3).map(impl.dhash56(_).longValue()))
    // strictness: trailing garbage, truncated last frame, non-BM mid-stream,
    // a crafted size overrunning the payload, empty payload
    assert(impl.reelDHashes(reel ++ Array[Byte](1, 2)) == null)
    assert(impl.reelDHashes(reel.dropRight(1)) == null)
    assert(impl.reelDHashes(f1 ++ Array.fill[Byte](60)(0) ++ f2) == null)
    val overrun = f1.clone
    overrun(2) = -1; overrun(3) = -1; overrun(4) = -1; overrun(5) = -1
    assert(impl.reelDHashes(overrun) == null)
    assert(impl.reelDHashes(Array.emptyByteArray) == null)
  }

  test("data_mm_scene_cuts: cuts exactly at scene boundaries when content shifts") {
    val rows = Registry.byName("data_mm_scene_cuts").build(spark, TestSpark.sf)
      .select($"doc_id", $"frame_id", $"hamming_prev", $"is_cut")
      .as[(Long, Long, Option[Long], Boolean)].collect().toSeq
    assert(rows.nonEmpty && rows.size % MediaQueries.ReelFrames == 0)
    // frame 0 never a cut; hamming_prev null exactly there
    rows.foreach { case (_, f, hp, cut) =>
      if (f == 0L) assert(hp.isEmpty && !cut) else assert(hp.nonEmpty)
    }
    // within a scene (same rotation) consecutive frames are identical
    rows.filter(r => r._2 % MediaQueries.ReelGroup != 0).foreach { r =>
      assert(r._3.contains(0L) && !r._4, r.toString)
    }
    // the corpus produces a non-degenerate cut structure
    assert(rows.exists(_._4), "no scene cut detected anywhere")
  }

  test("data_mm_neardup: banding finds EVERY pair within the Hamming radius") {
    // Brute-force ground truth: all image pairs with popcount(xor) <= 3.
    // The band guarantee (<= 3 dirty bits over 4 bands) means the banded
    // candidate join must surface exactly this set — no misses.
    MediaFunctions.register(spark)
    import MediaFunctions.media_dhash
    val hashes = Multimodal.packRealMedia(
        Tables.documents(spark, TestSpark.sf), "doc_id", "text")
      .select($"doc_id", media_dhash($"payload").as("h"))
      .where($"h".isNotNull)
      .as[(Long, Long)].collect().toSeq
    val want = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= MediaQueries.HamThresh
    } yield (a, b, d.toLong)).sortBy(p => (p._1, p._2))
    val got = Registry.byName("data_mm_neardup").build(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("packRealMedia + decodeFeatures on testdata matches text-derived truth") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val got = Multimodal.decodeFeatures(
      Multimodal.packRealMedia(docs, "doc_id", "text"), "doc_id")
      .orderBy("doc_id").collect()
    val src = docs.select($"doc_id", $"text").orderBy("doc_id")
      .as[(Long, String)].collect()
    assert(got.length == src.length && got.nonEmpty)
    src.zip(got).foreach { case ((id, text), r) =>
      val codes = text.take(64).map(_.toInt)
      if (id % 10 == 3) {
        assert(r.getString(1) == "unknown" && !r.getBoolean(2) && r.getLong(6) == 0L)
      } else if (id % 2 == 0) {
        val samples = codes.map(c => ((c % 128) - 64).toLong * 256)
        assert(r.getString(1) == "wav" && r.getBoolean(2))
        assert(r.getInt(5) == Multimodal.WavRate)
        assert(r.getLong(6) == samples.length.toLong)
        assert(r.getLong(7) == samples.sum)
      } else {
        val pix = codes.take(codes.length / Multimodal.BmpWidth * Multimodal.BmpWidth)
          .map(c => (c % 256).toLong)
        assert(r.getString(1) == "bmp" && r.getBoolean(2))
        assert(r.getInt(3) == Multimodal.BmpWidth)
        assert(r.getLong(6) == pix.length.toLong)
        assert(r.getLong(7) == pix.sum)
      }
    }
  }

  test("compiled text pixels == HOF forms on awkward inputs " +
      "(unicode, surrogate pairs, empty, null, sub-row)") {
    graft.functions.TextPixelFunctions.register(spark)
    import graft.functions.TextPixelFunctions.text_rgb_pixels
    val W = Multimodal.BmpWidth
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog and more words here",
      "short", "",
      "caf\u00e9 na\u00efve \u4e2d\u6587\u6587\u672c \ud83d\ude00\ud83c\udf89 mixed content and tail",
      "exactly seven!!", "x" * 100)
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // gray: the shipped fullRowPixels (compiled) vs the HOF definition
    // (NULL text is excluded from parity ON PURPOSE: Spark's least()
    // skips nulls, so the HOF accidentally emits maxN NULL pixels there
    // \u2014 every consumer filters isNotNull first, and the compiled form
    // pins the sane empty array instead, asserted below)
    val gray = df.select($"id",
        Multimodal.fullRowPixels($"text").as("got"),
        Multimodal.fullRowPixelsHof($"text").as("want"))
      .as[(Long, Seq[Int], Seq[Int])].collect().toSeq
    gray.foreach { case (id, got, want) =>
      assert(got == want, s"gray mismatch on row $id: $got vs $want")
    }
    val nullRow = Seq((0L, null.asInstanceOf[String])).toDF("id", "text")
    assert(nullRow.select(Multimodal.fullRowPixels($"text").as("p"))
      .as[Seq[Int]].head() == Seq.empty)
    assert(nullRow.select(text_rgb_pixels($"text", 64, W).as("p"))
      .as[Seq[Int]].head() == Seq.empty)
    // rgb: compiled packed build vs the HOF packed build
    val codes = Multimodal.textCodes($"text", 64)
    val packed = transform(codes, c =>
      pmod(c, lit(256)) * 65536 + pmod(c * 3 + 7, lit(256)) * 256 +
        pmod(c * 5 + 11, lit(256)))
    val pxHof = slice(packed, lit(1),
      floor(size(packed) / W).cast("int") * W)
    val rgb = df.select($"id",
        text_rgb_pixels($"text", 64, W).as("got"), pxHof.as("want"))
      .as[(Long, Seq[Int], Seq[Int])].collect().toSeq
    rgb.foreach { case (id, got, want) =>
      assert(got == want, s"rgb mismatch on row $id: $got vs $want")
    }
  }

  test("fused JPEG roundtrips == the composed encode/decode/fold chains") {
    graft.functions.JpegFunctions.register(spark)
    import graft.functions.JpegFunctions._
    val W = 7
    // crafted pixel rows: smooth (in band), noise (still in band at the
    // published tols), plus a sub-row input (null struct on both paths)
    val smooth = (0 until 35).map(i => 100 + i % 8)
    val noise = (0 until 35).map(i => (i * 53 + 11) % 256)
    val tiny = Seq(1, 2, 3)
    val df = Seq((1L, smooth), (2L, noise), (3L, tiny))
      .toDF("id", "px")
    val fused = df.select($"id", jpeg_roundtrip_gray($"px", W,
        MediaQueries.JpegQuality, MediaQueries.JpegPixTol,
        MediaQueries.JpegMeanTol).as("m"))
      .select($"id", $"m.valid", $"m.n_values",
        $"m.mean_within_tol", $"m.pixels_within_tol")
      .as[(Long, Option[Boolean], Option[Long], Option[Boolean], Option[Boolean])]
      .collect().toSeq.sortBy(_._1)
    val composed = df.select($"id", $"px",
        media_decode_jpeg(jpeg_encode_gray($"px", W,
          MediaQueries.JpegQuality)).as("m"))
      .select($"id", $"m.valid", $"m.n_values",
        (abs($"m.sum_val".cast("double") / $"m.n_values"
          - aggregate($"px", lit(0L), (a, x) => a + x).cast("double")
            / size($"px")) <= MediaQueries.JpegMeanTol)
          .as("mean_ok"),
        (aggregate(zip_with($"m.pixels", $"px", (d, s) => abs(d - s)),
          lit(0), (a, x) => greatest(a, x)) <= MediaQueries.JpegPixTol)
          .as("pix_ok"))
      .as[(Long, Option[Boolean], Option[Long], Option[Boolean], Option[Boolean])]
      .collect().toSeq.sortBy(_._1)
    assert(fused == composed)
    assert(fused.find(_._1 == 3L).get._2.isEmpty) // sub-row: null on both
    // a pixel band violation must FLIP the boolean, not just never fire:
    // tolerance 0 fails on lossy noise while geometry stays valid
    val strict = df.where($"id" === 2L).select(jpeg_roundtrip_gray($"px",
        W, MediaQueries.JpegQuality, 0, 0.0).as("m"))
      .select($"m.valid", $"m.mean_within_tol", $"m.pixels_within_tol")
      .as[(Boolean, Boolean, Boolean)].head()
    assert(strict._1 && !strict._3)

    // color twin
    val rgbPx = (0 until 35).map { i =>
      val c = (i * 53 + 11) % 256
      (c << 16) | (((c * 3 + 7) % 256) << 8) | ((c * 5 + 11) % 256)
    }
    val dfc = Seq((1L, rgbPx)).toDF("id", "px")
    def ch(c: org.apache.spark.sql.Column, s: Int) =
      (if (s == 0) c else shiftright(c, s)).bitwiseAND(lit(255))
    def luma(c: org.apache.spark.sql.Column) =
      ((ch(c, 16) * 299 + ch(c, 8) * 587 + ch(c, 0) * 114) / 1000)
        .cast("int")
    def meanTolOf(sumCol: org.apache.spark.sql.Column, shift: Int) =
      abs(sumCol.cast("double") / $"m.n_pixels"
        - aggregate($"px", lit(0L), (a, x) => a + ch(x, shift).cast("long"))
            .cast("double") / size($"px")) <= MediaQueries.JpegRgbMeanTol
    val fusedC = dfc.select(jpeg_roundtrip_rgb($"px", W,
        MediaQueries.JpegQuality, MediaQueries.JpegRgbLumaTol,
        MediaQueries.JpegRgbMeanTol).as("m"))
      .select($"m.valid", $"m.n_pixels", $"m.mean_r_within_tol",
        $"m.mean_g_within_tol", $"m.mean_b_within_tol",
        $"m.luma_within_tol")
      .as[(Boolean, Long, Boolean, Boolean, Boolean, Boolean)].head()
    val composedC = dfc.select($"px",
        media_decode_jpeg_rgb(jpeg_encode_rgb($"px", W,
          MediaQueries.JpegQuality)).as("m"))
      .select($"m.valid", $"m.n_pixels",
        meanTolOf($"m.sum_r", 16), meanTolOf($"m.sum_g", 8),
        meanTolOf($"m.sum_b", 0),
        (aggregate(zip_with($"m.pixels", $"px",
          (d, s) => abs(luma(d) - luma(s))),
          lit(0), (a, x) => greatest(a, x)) <= MediaQueries.JpegRgbLumaTol))
      .as[(Boolean, Long, Boolean, Boolean, Boolean, Boolean)].head()
    assert(fusedC == composedC)
  }
}
