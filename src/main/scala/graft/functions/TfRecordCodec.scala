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
  override def nullable: Boolean = false
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

  override def eval(input: InternalRow): Any =
    TfRecordCodecImpl.frame(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ch = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        ${ch.code}
        byte[] ${ev.value} = graft.functions.TfRecordCodecImpl.frame(
          ${ch.isNull} ? null : ${ch.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TfRecordFrame =
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
  }

  /** Requires [[register]] on the session first. */
  def tfrecord_frame(ids: Column): Column =
    org.apache.spark.sql.functions.call_function("tfrecord_frame", ids)
  def tfrecord_parse(framed: Column): Column =
    org.apache.spark.sql.functions.call_function("tfrecord_parse", framed)
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
