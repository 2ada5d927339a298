package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram shingling: `["a","b","c"], n=2` →
  * `["a b","b c"]` — the exact contract of the composable HOF form
  * (`when(size(w) >= n, transform(sequence(0, size(w)-n),
  * i => concat_ws(" ", w[i+1..i+n]))).otherwise(array())`,
  * [[graft.data.TextAnalysis.shinglesHof]]) and therefore of every
  * DuckDB shingle oracle, so the LSH family's md5-of-shingle minhashes
  * stay bit-identical across all three forms (parity-spec'd in
  * DataOpsSpec).
  *
  * Why an expression: the HOF form is the single hottest interpreted
  * spot in the text family — ~2 interpreted lambda dispatches ×
  * (|words| − n + 1) windows per row, each `concat_ws` dispatch
  * re-boxing its window — and it runs on EVERY text query's scan
  * (signatures, jaccard sets, bigram models, span shingles). This is one
  * compiled pass per row: word UTF8Strings extracted once (each word is
  * read by up to n windows), `UTF8String.concatWs` per window — the
  * same null-skipping concat the HOF's `concat_ws` lowers to. Per-row
  * projection, embarrassingly parallel at any scale; purely the CPU
  * constant.
  *
  * Null semantics, matching the HOF exactly: a NULL or shorter-than-n
  * array yields the EMPTY array (the HOF's `when` predicate is NULL for
  * a NULL array → `otherwise`), and NULL elements are skipped by
  * concatWs within their windows (never yielding a NULL shingle), so
  * the result never contains nulls and is itself never null.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingles"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    WordShinglesImpl.compute(child.eval(input).asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Hand-rolled null plumbing (not defineCodeGen): a NULL child must
    // still produce the empty array, so the child's isNull routes to
    // compute(null) — same shape as MinHashSig.
    val c = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = graft.functions.WordShinglesImpl.compute(
          ${c.isNull} ? null : ${c.value}, $n);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShinglesImpl {
  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(words: ArrayData, n: Int): ArrayData = {
    if (words == null) return Empty
    val m = words.numElements()
    if (m < n) return Empty
    val ws = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      ws(i) = if (words.isNullAt(i)) null else words.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      val win = new Array[UTF8String](n)
      var k = 0
      while (k < n) { win(k) = ws(i + k); k += 1 }
      out(i) = UTF8String.concatWs(Space, win: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Registry + Column handle, same pattern as [[MinHashFunctions]]. */
object WordShingleFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles")))
      registry.createOrReplaceTempFunction(
        "word_shingles",
        exprs => {
          if (exprs.length != 2) throw new IllegalArgumentException(
            s"word_shingles(words, n): expected 2 arguments, got ${exprs.length}")
          exprs(1) match {
            case Literal(v: Int, IntegerType) => WordShingles(exprs.head, v)
            case other => throw new IllegalArgumentException(
              s"word_shingles(words, n): n must be an integer literal, got $other")
          }
        },
        "scala_udf")
  }

  /** Requires [[register]] on the session first. */
  def word_shingles(words: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "word_shingles", words, org.apache.spark.sql.functions.lit(n))
}
