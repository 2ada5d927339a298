package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature: for seeds i = 0..k-1, the lexicographic
  * minimum of `md5("<i>|<shingle>")` hex strings over the shingle array —
  * the exact contract of the composable HOF form
  * (`transform(sequence(0,k-1), i => array_min(transform(sh, s => md5(...))))`,
  * [[graft.data.Dedup.minhashSigHof]]) and of the DuckDB oracle twin, so
  * signatures stay bit-identical across engines (parity-spec'd in
  * DataOpsSpec).
  *
  * Why an expression: the HOF form runs ~3 interpreted lambda dispatches ×
  * k seeds × |shingles| per row, allocating a 32-char hex UTF8String per
  * hash plus k intermediate arrays, and `array_min` re-walks each of them.
  * This expression makes one compiled pass per shingle: UTF-8 bytes read
  * once, one reused thread-local [[MessageDigest]], minima tracked as RAW
  * 16-byte digests (hex encoding is monotone nibble→char, so hex-string
  * order == unsigned-byte digest order), and only the k winners are
  * hex-encoded at the end. No shuffle implications — still a per-row
  * projection, embarrassingly parallel at any scale — this is purely the
  * CPU constant.
  *
  * Null semantics, matching the HOF form exactly: NULL elements contribute
  * nothing (md5(NULL) is NULL and array_min skips NULLs); an empty,
  * all-NULL, or NULL array yields an array of k NULLs — NOT a NULL array,
  * because the HOF's outer `transform` runs over the seed sequence
  * regardless of the shingle array (caught by the DataOpsSpec parity
  * test), so this expression is never null-intolerant.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"minhash signature length must be positive, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    MinHashSigImpl.seedPrefixes(k)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    MinHashSigImpl.compute(
      child.eval(input).asInstanceOf[ArrayData], prefixes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The whole computation is one static call on a precomputed reference
    // object — stays inside whole-stage codegen (no interpreted lambda
    // dispatch) with the loop itself in compiled Scala. Hand-rolled null
    // plumbing (not defineCodeGen): a NULL child must still produce the
    // k-null array, so the child's isNull routes to compute(null).
    val ref = ctx.addReferenceObj("minhashPrefixes", prefixes, "byte[][]")
    val c = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = graft.functions.MinHashSigImpl.compute(
          ${c.isNull} ? null : ${c.value}, $ref);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSigImpl {
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".toCharArray

  def seedPrefixes(k: Int): Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i|".getBytes("UTF-8"))

  /** Unsigned lexicographic byte compare — equivalent to comparing the hex
    * encodings as strings. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = Hex(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(shingles: ArrayData, prefixes: Array[Array[Byte]]): ArrayData = {
    val k = prefixes.length
    val md = md5Local.get()
    val n = if (shingles == null) 0 else shingles.numElements()
    val mins = new Array[Array[Byte]](k)
    var scratch = new Array[Byte](16)
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        val sb = shingles.getUTF8String(j).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(prefixes(i))
          md.update(sb)
          md.digest(scratch, 0, 16)
          if (mins(i) == null || less(scratch, mins(i))) {
            val prev = mins(i)
            mins(i) = scratch
            scratch = if (prev == null) new Array[Byte](16) else prev
          }
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) = if (mins(i) == null) null else hex(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Registry + Column handle, same pattern as [[VectorFunctions]]. */
object MinHashFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig")))
      registry.createOrReplaceTempFunction(
        "minhash_sig",
        exprs => exprs(1) match {
          case Literal(v: Int, IntegerType) => MinHashSig(exprs.head, v)
          case other => throw new IllegalArgumentException(
            s"minhash_sig(shingles, k): k must be an integer literal, got $other")
        },
        "scala_udf")
  }

  /** Requires [[register]] on the session first. */
  def minhash_sig(shingles: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "minhash_sig", shingles, org.apache.spark.sql.functions.lit(k))
}
