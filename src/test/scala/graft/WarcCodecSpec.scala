package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WarcFunctions

/** Crafted-payload coverage for the WARC container parser: the
  * whole-container acceptance contract (any malformed byte rejects
  * everything) and the Content-Length discipline (payload bytes are
  * sliced, never delimiter-scanned). */
class WarcCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(id: Long, payload: String, extra: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: response\r\n$extra" +
      s"WARC-Record-ID: <urn:graft:$id>\r\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" +
      s"$payload\r\n\r\n"

  private def parse(container: String): Option[Seq[(Long, Long, Long, String)]] = {
    WarcFunctions.register(spark)
    val r = Seq(container).toDF("c")
      .select(WarcFunctions.warc_records(col("c")).as("r"))
      .as[Option[Seq[(Long, Long, Long, String)]]]
      .head()
    r
  }

  test("two-record container parses with exact byte offsets") {
    val c = rec(7, "hello world") + rec(42, "x")
    val out = parse(c).get
    assert(out.map(r => (r._1, r._3, r._4)) ==
      Seq((7L, 11L, "hello world"), (42L, 1L, "x")))
    // offsets point at the payload bytes themselves
    out.foreach { case (_, off, len, payload) =>
      assert(c.substring(off.toInt, off.toInt + len.toInt) == payload)
    }
  }

  test("Content-Length discipline: payload containing header-lookalike text") {
    // A payload that CONTAINS a full well-formed record must come back
    // verbatim — a delimiter-scanning parser would split it.
    val evil = "WARC/1.0\r\nWARC-Record-ID: <urn:graft:666>\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n"
    val out = parse(rec(1, evil)).get
    assert(out == Seq((1L, 81L + 1 + 2, evil.getBytes("UTF-8").length.toLong, evil)))
  }

  test("unknown header fields are tolerated (spec allows any WARC-*)") {
    val c = rec(3, "abc", extra = "WARC-Target-URI: http://example.test/\r\n")
    assert(parse(c).get.map(_._1) == Seq(3L))
  }

  test("whole-container rejection: every malformation nulls everything") {
    val good = rec(1, "abc")
    // trailing junk after the last record
    assert(parse(good + "x").isEmpty)
    // truncated payload (Content-Length larger than remaining bytes)
    assert(parse(good.replace("Content-Length: 3", "Content-Length: 400")).isEmpty)
    // missing mandatory Content-Length
    assert(parse("WARC/1.0\r\nWARC-Record-ID: <urn:graft:1>\r\n\r\nabc\r\n\r\n").isEmpty)
    // duplicated Content-Length
    assert(parse(good.replace("Content-Length: 3\r\n",
      "Content-Length: 3\r\nContent-Length: 3\r\n")).isEmpty)
    // bad record terminator (payload overruns into it)
    assert(parse(good.replace("abc\r\n\r\n", "abc\r\nxx")).isEmpty)
    // wrong version line
    assert(parse(good.replace("WARC/1.0", "WARC/9.9")).isEmpty)
    // malformed record id (non-digits)
    assert(parse(good.replace("<urn:graft:1>", "<urn:graft:one>")).isEmpty)
    // header line without the ": " separator
    assert(parse(good.replace("WARC-Type: response", "WARC-Type response")).isEmpty)
    // a second record going bad rejects the first too
    assert(parse(good + "WARC/1.0\r\ngarbage").isEmpty)
  }

  test("empty container is zero records, not a rejection") {
    assert(parse("").get.isEmpty)
  }
}
