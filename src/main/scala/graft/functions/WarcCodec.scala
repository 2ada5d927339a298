package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC-shaped crawl-container parsing — the ingest format 100 TB web
  * corpora actually arrive in (Common Crawl ships WARC/1.0 files; every
  * curation pipeline's first step is splitting them into records).
  *
  * The container subset implemented is spec-faithful where it matters:
  * CRLF line endings, a `WARC/1.0` version line, named header fields in
  * ANY order with unknown fields tolerated (the spec allows arbitrary
  * `WARC-*` headers), `Content-Length` counting payload OCTETS (the
  * spec's definition — never a delimiter scan, so payloads containing
  * header-lookalike text can never confuse the parser), and the
  * mandatory CRLF CRLF record terminator. A container is accepted only
  * if EVERY byte is consumed by well-formed records — trailing junk,
  * truncation mid-payload, a missing mandatory field, a duplicated
  * `Content-Length`, or a bad terminator reject the WHOLE container
  * (the exact-length classification contract the PGM codec settled on:
  * partial acceptance turns dirty data into silently wrong records).
  *
  * Scale shape: parsing is a per-row projection (one compiled pass per
  * container, records emitted with their byte offsets) — map-only at any
  * corpus size. Containers are built per (source, shard) so their size
  * is bounded by the sharding, mirroring the ~1 GB convention of real
  * WARC files; the shard count is the knob that scales with the corpus.
  */
object WarcCodecImpl {

  /** Parsed-record schema: byte offset of the payload within the
    * container, payload octet count, and the payload itself. */
  val RecordSchema: StructType = StructType(Seq(
    StructField("rec_id", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  val RecordsType: ArrayType = ArrayType(RecordSchema, containsNull = false)

  private val Version = "WARC/1.0"
  private val IdPrefix = "<urn:graft:"
  private val IdSuffix = ">"

  /** Parse a whole container to its records, or null if ANY byte fails
    * to participate in a well-formed record. */
  def records(container: UTF8String): ArrayData = {
    if (container == null) return null
    val b = container.getBytes
    val out = ArrayBuffer.empty[InternalRow]
    var p = 0
    while (p < b.length) {
      // -- version line ------------------------------------------------
      val v = readLine(b, p)
      if (v == null || v._1 != Version) return null
      p = v._2
      // -- header fields until the blank line ---------------------------
      var recId = -1L
      var idSeen = false
      var len = -1L
      var lenSeen = false
      var inHeader = true
      while (inHeader) {
        val l = readLine(b, p)
        if (l == null) return null
        p = l._2
        val line = l._1
        if (line.isEmpty) inHeader = false
        else {
          val sep = line.indexOf(": ")
          if (sep <= 0) return null
          val name = line.substring(0, sep)
          val value = line.substring(sep + 2)
          name match {
            case "WARC-Record-ID" =>
              if (idSeen) return null // duplicated mandatory field
              idSeen = true
              recId = parseRecId(value)
              if (recId < 0) return null
            case "Content-Length" =>
              if (lenSeen) return null
              lenSeen = true
              len = parseDigits(value)
              if (len < 0) return null
            case _ => () // unknown headers are legal WARC
          }
        }
      }
      if (!idSeen || !lenSeen) return null
      // -- payload of exactly Content-Length octets + CRLF CRLF ---------
      if (len > b.length - p - 4) return null // truncated (also overflow-safe)
      val payload = UTF8String.fromBytes(b, p, len.toInt)
      val off = p.toLong
      p += len.toInt
      if (b(p) != '\r' || b(p + 1) != '\n' ||
          b(p + 2) != '\r' || b(p + 3) != '\n') return null
      p += 4
      out += new GenericInternalRow(Array[Any](recId, off, len, payload))
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Read one CRLF-terminated header line as ISO-8859-1 (header fields
    * are ASCII by construction; any high byte simply fails the field
    * matches). Returns (line, posAfterCrlf) or null if no CRLF before
    * end-of-container. */
  private def readLine(b: Array[Byte], start: Int): (String, Int) = {
    var i = start
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n')
        return (new String(b, start, i - start,
          java.nio.charset.StandardCharsets.ISO_8859_1), i + 2)
      i += 1
    }
    null
  }

  /** `<urn:graft:123>` → 123, or -1 if malformed. */
  private def parseRecId(v: String): Long = {
    if (!v.startsWith(IdPrefix) || !v.endsWith(IdSuffix)) return -1L
    parseDigits(v.substring(IdPrefix.length, v.length - IdSuffix.length))
  }

  /** Non-empty all-digit string → Long, else -1 (overflow rejects). */
  private def parseDigits(s: String): Long = {
    if (s.isEmpty || s.length > 18) return -1L
    var i = 0
    var acc = 0L
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return -1L
      acc = acc * 10 + (c - '0')
      i += 1
    }
    acc
  }
}

/** `warc_records(container string)` → array<struct> of parsed records;
  * null when the container is not wholly well-formed. */
case class WarcRecords(child: Expression) extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = WarcCodecImpl.RecordsType
  override def prettyName: String = "warc_records"

  override protected def nullSafeEval(input: Any): Any =
    WarcCodecImpl.records(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.WarcCodecImpl.records($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

/** Registry + Column handle, same pattern as [[WordShingleFunctions]]. */
object WarcFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("warc_records")))
      registry.createOrReplaceTempFunction(
        "warc_records",
        exprs => {
          if (exprs.length != 1) throw new IllegalArgumentException(
            s"warc_records(container): expected 1 argument, got ${exprs.length}")
          WarcRecords(exprs.head)
        },
        "scala_udf")
  }

  /** Requires [[register]] on the session first. */
  def warc_records(container: Column): Column =
    org.apache.spark.sql.functions.call_function("warc_records", container)
}
