package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** One-pass hashed-linear-model accumulation over a token array:
  * `Σ ((hex4(md5(tok)) mod buckets) mod 7 − 3)` — the exact arithmetic of
  * [[graft.data.TextAnalysis.linearScoreColumns]]'s composable HOF form
  * (and the DuckDB oracle), compiled: one reused thread-local MD5, the
  * first two digest bytes read as the hex4 integer directly (hex encoding
  * is positional, so `hex4 = (b₀ << 8) | b₁` unsigned), no per-token
  * UTF8String hex allocation, no interpreted lambda dispatch. The HOF
  * form dispatches ~6 interpreted nodes per token (md5 → substring →
  * conv → cast → two mods) — the classifier query's entire 0.55 s tail
  * at 10× scale. Parity-spec'd in DataOpsSpec.
  *
  * Null semantics, matching the HOF aggregate exactly: a NULL element
  * poisons the sum (`acc + null = null`), a NULL array yields NULL.
  */
case class HashedWeightSum(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_weight_sum"

  override def eval(input: InternalRow): Any =
    HashedWeightSumImpl.compute(
      child.eval(input).asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code = code"""
      ${c.code}
      Object ${ev.value}_o = graft.functions.HashedWeightSumImpl.compute(
        ${c.isNull} ? null : ${c.value}, $buckets);
      boolean ${ev.isNull} = ${ev.value}_o == null;
      long ${ev.value} = ${ev.isNull} ? -1L : ((Long) ${ev.value}_o).longValue();""")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWeightSum =
    copy(child = newChild)
}

object HashedWeightSumImpl {
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Boxed Long sum, or null (null array / any null element). */
  def compute(words: ArrayData, buckets: Int): java.lang.Long = {
    if (words == null) return null
    val md = md5Local.get()
    val n = words.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) return null
      md.reset()
      val d = md.digest(words.getUTF8String(i).getBytes)
      // first 4 hex digits == first 2 digest bytes, big-endian unsigned
      val hex4 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      sum += (hex4 % buckets) % 7 - 3
      i += 1
    }
    java.lang.Long.valueOf(sum)
  }
}

object TextExprFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("hashed_weight_sum")))
      registry.createOrReplaceTempFunction(
        "hashed_weight_sum",
        exprs => {
          // arity first: exprs(1) on a 1-arg SQL call must raise the
          // usage message, not IndexOutOfBoundsException
          if (exprs.length != 2) throw new IllegalArgumentException(
            s"hashed_weight_sum(words, buckets): expected 2 arguments, got ${exprs.length}")
          exprs(1) match {
            case Literal(v: Int, IntegerType) => HashedWeightSum(exprs.head, v)
            case other => throw new IllegalArgumentException(
              s"hashed_weight_sum(words, buckets): buckets must be an integer literal, got $other")
          }
        },
        "scala_udf")
  }

  def registerBpe(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_apply")))
      registry.createOrReplaceTempFunction(
        "bpe_apply",
        exprs => {
          if (exprs.length != 2) throw new IllegalArgumentException(
            s"bpe_apply(word, vocab): expected 2 arguments, got ${exprs.length}")
          exprs(1) match {
            case v if v.foldable && v.dataType.isInstanceOf[
                org.apache.spark.sql.types.ArrayType] =>
              val arr = v.eval().asInstanceOf[ArrayData]
              BpeApply(exprs.head,
                (0 until arr.numElements()).map(i =>
                  arr.getUTF8String(i).toString))
            case other => throw new IllegalArgumentException(
              s"bpe_apply(word, vocab): vocab must be a literal string array, got $other")
          }
        },
        "scala_udf")
  }

  /** Requires [[register]] on the session first. */
  def hashed_weight_sum(words: Column, buckets: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "hashed_weight_sum", words, org.apache.spark.sql.functions.lit(buckets))

  /** Requires [[registerBpe]] on the session first. */
  def bpe_apply(word: Column, vocab: Seq[String]): Column =
    org.apache.spark.sql.functions.call_function("bpe_apply", word,
      org.apache.spark.sql.functions.array(
        vocab.map(org.apache.spark.sql.functions.lit): _*))
}
