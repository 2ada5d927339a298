package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled one-pass forms of the media family's text→pixel fixture
  * derivations ([[graft.data.Multimodal.fullRowPixels]] and the color
  * query's packed-0xRRGGBB build). The HOF forms are the semantic
  * definitions and stay as the parity references (MediaProps asserts
  * bit-identical output, including code points beyond ASCII, surrogate
  * pairs, empty and null text); these run on every image-query scan,
  * where the interpreted ascii/transform/pmod lambda chain was measured
  * at ~2.3 s of the JPEG query's 3.6 s at sf10 — the pixel BUILD, not
  * the codec, was the hot spot.
  *
  * Semantics replicated exactly on every NON-NULL input: the first
  * `maxN` CODE POINTS of the text (Spark's `length`/`substr`/`ascii`
  * all count code points), gray = cp % 256, packed = (cp%256)·65536 +
  * ((3cp+7)%256)·256 + (5cp+11)%256, truncated to full `width` rows.
  * NULL text yields the EMPTY array — deliberately NOT the HOF form's
  * accident (Spark's `least` skips nulls, so `least(length(NULL),
  * maxN)` = maxN and the HOF emits maxN NULL pixels); consumers either
  * filter `text IS NOT NULL` before the projection (the image queries)
  * or pin the null case explicitly ([[graft.data.Multimodal
  * .packRealMedia]] maps NULL text to a NULL payload), and zero pixels
  * is the only sane image for no text.
  */
object TextPixelsImpl {

  /** Code points of the first maxN chars; null → empty. */
  private def codePoints(text: UTF8String, maxN: Int): Array[Int] = {
    if (text == null) return Array.emptyIntArray
    val s = text.toString
    val out = new Array[Int](math.min(s.codePointCount(0, s.length), maxN))
    var i = 0; var k = 0
    while (k < out.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      i += Character.charCount(cp)
      k += 1
    }
    out
  }

  def grayFullRows(text: UTF8String, maxN: Int, width: Int): GenericArrayData = {
    val cps = codePoints(text, maxN)
    val n = cps.length / width * width
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = cps(i) % 256; i += 1 }
    new GenericArrayData(out)
  }

  def rgbFullRows(text: UTF8String, maxN: Int, width: Int): GenericArrayData = {
    val cps = codePoints(text, maxN)
    val n = cps.length / width * width
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val c = cps(i)
      out(i) = (c % 256) * 65536 + ((c * 3 + 7) % 256) * 256 + (c * 5 + 11) % 256
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `text_gray_pixels(text, maxN, width)` → array<int>: gray pixels of the
  * first maxN code points, truncated to full rows. Never null (null text
  * → empty array — the HOF convention). */
case class TextGrayPixels(child: Expression, maxN: Int, width: Int)
    extends UnaryExpression {
  require(maxN > 0 && width > 0, s"need maxN/width > 0, got $maxN/$width")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "text_gray_pixels"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextPixelsImpl.grayFullRows(
      child.eval(input).asInstanceOf[UTF8String], maxN, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // hand-rolled null plumbing (the WordCells shape): NULL text must
    // still produce the empty array
    val ch = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        ${ch.code}
        $javaType ${ev.value} = graft.functions.TextPixelsImpl.grayFullRows(
          ${ch.isNull} ? null : ${ch.value}, $maxN, $width);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TextGrayPixels =
    copy(child = newChild)
}

/** `text_rgb_pixels(text, maxN, width)` → array<int> of packed 0xRRGGBB
  * pixels, truncated to full rows; null text → empty array. */
case class TextRgbPixels(child: Expression, maxN: Int, width: Int)
    extends UnaryExpression {
  require(maxN > 0 && width > 0, s"need maxN/width > 0, got $maxN/$width")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "text_rgb_pixels"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextPixelsImpl.rgbFullRows(
      child.eval(input).asInstanceOf[UTF8String], maxN, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ch = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        ${ch.code}
        $javaType ${ev.value} = graft.functions.TextPixelsImpl.rgbFullRows(
          ${ch.isNull} ? null : ${ch.value}, $maxN, $width);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TextRgbPixels =
    copy(child = newChild)
}

object TextPixelFunctions {

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
    put("text_gray_pixels", exprs => {
      if (exprs.length != 3) throw new IllegalArgumentException(
        s"text_gray_pixels(text, maxN, width): expected 3 arguments, " +
          s"got ${exprs.length}")
      TextGrayPixels(exprs.head, intLit(exprs(1), "text_gray_pixels"),
        intLit(exprs(2), "text_gray_pixels"))
    })
    put("text_rgb_pixels", exprs => {
      if (exprs.length != 3) throw new IllegalArgumentException(
        s"text_rgb_pixels(text, maxN, width): expected 3 arguments, " +
          s"got ${exprs.length}")
      TextRgbPixels(exprs.head, intLit(exprs(1), "text_rgb_pixels"),
        intLit(exprs(2), "text_rgb_pixels"))
    })
  }

  def text_gray_pixels(text: Column, maxN: Int, width: Int): Column =
    org.apache.spark.sql.functions.call_function("text_gray_pixels", text,
      org.apache.spark.sql.functions.lit(maxN),
      org.apache.spark.sql.functions.lit(width))
  def text_rgb_pixels(text: Column, maxN: Int, width: Int): Column =
    org.apache.spark.sql.functions.call_function("text_rgb_pixels", text,
      org.apache.spark.sql.functions.lit(maxN),
      org.apache.spark.sql.functions.lit(width))
}
