package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** TFRecord framing of a packed token-id sequence — the wire format
  * training loaders actually read (TensorFlow's `tf.data.TFRecordDataset`
  * record layout, public spec in the TensorFlow repo's
  * `tensorflow/core/lib/io/record_writer.h`):
  *
  *   [ length        : 8 bytes, little-endian uint64 ]
  *   [ masked_crc32c(length bytes)  : 4 bytes LE     ]
  *   [ payload       : `length` bytes                ]
  *   [ masked_crc32c(payload bytes) : 4 bytes LE     ]
  *
  * with `mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8` over
  * uint32 and CRC32C the Castagnoli polynomial (JDK `java.util.zip.CRC32C`
  * — hardware-accelerated where available). The payload here is the
  * sequence's token ids as 4-byte little-endian uint32 each (vocabulary
  * ids are small by construction; the frame REQUIRES them to fit).
  *
  * Compiled Catalyst expressions, the [[WordCells]] pattern: one static
  * call per row inside whole-stage codegen, no UDF. [[TfRecordParse]] is
  * the honest inverse — it re-derives both CRCs from the bytes and
  * reports their validity, so a frame→parse roundtrip in one plan
  * proves the writer's arithmetic with the same fused-roundtrip
  * discipline as the JPEG codec.
  */
case class TfRecordFrame(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  // NULL propagates (the default null-intolerant unary contract): a null
  // token array must NOT silently become a well-formed empty-payload
  // record — that would be indistinguishable from a real empty sequence
  // on the parse side, which is malformed-TOLERANT, not null-inventing.
  // An EMPTY (non-null) array still frames to the valid 16-byte record.
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "tfrecord_frame"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tfrecord_frame expects array<bigint> token ids, got $other")
    }

  override def nullSafeEval(ids: Any): Any =
    TfRecordCodecImpl.frame(ids.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ch =>
      s"${ev.value} = graft.functions.TfRecordCodecImpl.frame($ch);")

  override protected def withNewChildInternal(newChild: Expression): TfRecordFrame =
    copy(child = newChild)
}

/** Split a concatenated TFRecord STREAM (the byte content of a
  * `.tfrecord` file) into its individual framed records, each element a
  * complete frame [[TfRecordParse]] can judge. LOSSLESS by construction:
  * the concatenation of the returned elements is exactly the input — a
  * structurally broken tail (truncated frame, absurd length header) is
  * emitted as one final element for the parse side to flag malformed,
  * never silently dropped. One static call per row inside whole-stage
  * codegen, the [[TfRecordFrame]] discipline. */
case class TfRecordStreamSplit(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "tfrecord_split"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tfrecord_split expects a binary record stream, got $other")
    }

  override def nullSafeEval(buf: Any): Any =
    TfRecordCodecImpl.splitStream(buf.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ch =>
      s"${ev.value} = graft.functions.TfRecordCodecImpl.splitStream($ch);")

  override protected def withNewChildInternal(
      newChild: Expression): TfRecordStreamSplit =
    copy(child = newChild)
}

/** Decode + verify one TFRecord frame: (n_ids, len_crc_ok, data_crc_ok,
  * ids). Malformed input (short buffer, inconsistent length, payload not
  * a whole number of 4-byte ids) yields (-1, false, false, []) — the
  * media codecs' malformed-tolerant convention, never an exception. */
case class TfRecordParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_ids", LongType, nullable = false),
    StructField("len_crc_ok", BooleanType, nullable = false),
    StructField("data_crc_ok", BooleanType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "tfrecord_parse"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tfrecord_parse expects a binary frame, got $other")
    }

  override def eval(input: InternalRow): Any =
    TfRecordCodecImpl.parse(child.eval(input).asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ch = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        ${ch.code}
        $javaType ${ev.value} = graft.functions.TfRecordCodecImpl.parse(
          ${ch.isNull} ? null : ${ch.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TfRecordParse =
    copy(child = newChild)
}

/** Registry + Column handles, the [[WordCellFunctions]] pattern. */
object TfRecordFunctions {

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def put(name: String, arity: Int, mk: Seq[Expression] => Expression): Unit =
      if (!registry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name,
          exprs => {
            if (exprs.length != arity) throw new IllegalArgumentException(
              s"$name: expected $arity argument(s), got ${exprs.length}")
            mk(exprs)
          },
          "scala_udf")
    put("tfrecord_frame", 1, exprs => TfRecordFrame(exprs.head))
    put("tfrecord_parse", 1, exprs => TfRecordParse(exprs.head))
    put("tfrecord_split", 1, exprs => TfRecordStreamSplit(exprs.head))
  }

  /** Requires [[register]] on the session first. */
  def tfrecord_frame(ids: Column): Column =
    org.apache.spark.sql.functions.call_function("tfrecord_frame", ids)
  def tfrecord_parse(framed: Column): Column =
    org.apache.spark.sql.functions.call_function("tfrecord_parse", framed)
  def tfrecord_split(stream: Column): Column =
    org.apache.spark.sql.functions.call_function("tfrecord_split", stream)
}

object TfRecordCodecImpl {
  private val MaskDelta = 0xa282ead8L

  /** TFRecord's masked CRC32C of a byte range, as an unsigned int in a
    * long. */
  def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue // already final-xor'd, unsigned 32-bit in a long
    (((crc >>> 15) | ((crc << 17) & 0xffffffffL)) + MaskDelta) & 0xffffffffL
  }

  private def putIntLE(buf: Array[Byte], off: Int, v: Long): Unit = {
    buf(off) = (v & 0xff).toByte
    buf(off + 1) = ((v >>> 8) & 0xff).toByte
    buf(off + 2) = ((v >>> 16) & 0xff).toByte
    buf(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def getIntLE(buf: Array[Byte], off: Int): Long =
    (buf(off) & 0xffL) | ((buf(off + 1) & 0xffL) << 8) |
      ((buf(off + 2) & 0xffL) << 16) | ((buf(off + 3) & 0xffL) << 24)

  def frame(ids: ArrayData): Array[Byte] = {
    val n = if (ids == null) 0 else ids.numElements()
    val payloadLen = 4 * n
    val out = new Array[Byte](16 + payloadLen)
    // length: 8-byte LE (payload byte count)
    var L = payloadLen.toLong
    var i = 0
    while (i < 8) { out(i) = (L & 0xff).toByte; L >>>= 8; i += 1 }
    putIntLE(out, 8, maskedCrc(out, 0, 8))
    var k = 0
    while (k < n) {
      val id = ids.getLong(k)
      require(id >= 0 && id <= 0xffffffffL,
        s"token id $id does not fit a TFRecord uint32 payload slot")
      putIntLE(out, 12 + 4 * k, id)
      k += 1
    }
    putIntLE(out, 12 + payloadLen, maskedCrc(out, 12, payloadLen))
    out
  }

  private val Malformed: InternalRow = new GenericInternalRow(Array[Any](
    -1L, false, false, new GenericArrayData(Array.empty[Any])))

  /** Split a record stream at its length headers: each well-formed
    * prefix frame becomes one element; whatever cannot form a complete
    * frame (truncated tail, or a length that overruns the buffer) is
    * emitted verbatim as the last element. Concatenating the elements
    * reproduces the input byte-for-byte. */
  def splitStream(buf: Array[Byte]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var off = 0
    while (off < buf.length) {
      var ok = buf.length - off >= 16
      var L = 0L
      if (ok) {
        var i = 7
        while (i >= 0) { L = (L << 8) | (buf(off + i) & 0xffL); i -= 1 }
        ok = L >= 0 && L <= buf.length - off - 16
      }
      val take = if (ok) (16 + L).toInt else buf.length - off
      out += java.util.Arrays.copyOfRange(buf, off, off + take)
      off += take
    }
    new GenericArrayData(out.toArray)
  }

  def parse(buf: Array[Byte]): InternalRow = {
    if (buf == null || buf.length < 16) return Malformed
    var L = 0L
    var i = 7
    while (i >= 0) { L = (L << 8) | (buf(i) & 0xffL); i -= 1 }
    if (L != buf.length - 16 || L % 4 != 0) return Malformed
    val lenOk = getIntLE(buf, 8) == maskedCrc(buf, 0, 8)
    val dataOk = getIntLE(buf, 12 + L.toInt) == maskedCrc(buf, 12, L.toInt)
    val n = (L / 4).toInt
    val ids = new Array[Any](n)
    var k = 0
    while (k < n) { ids(k) = getIntLE(buf, 12 + 4 * k); k += 1 }
    new GenericInternalRow(Array[Any](
      n.toLong, lenOk, dataOk, new GenericArrayData(ids)))
  }
}
