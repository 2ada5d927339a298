package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document n-gram repetition stats over a token array:
  * `struct(total, dup, top)` where `total` is the number of n-gram
  * occurrences, `dup` the occurrences belonging to grams seen ≥ 2× in the
  * document, and `top` the count of the most frequent gram — the inputs
  * of the Gopher-style `dup_ngram_frac` / `top_ngram_frac` repetition
  * signals (`graft.data.TextAnalysis.ngramRepStats` is the composable
  * semantic definition and the DuckDB oracle's shape).
  *
  * Why an expression: the HOF definition counts by
  * `transform(array_distinct(g), x -> size(filter(g, y -> y = x)))` —
  * O(distinct × total) INTERPRETED lambda dispatches per document
  * (measured 100 s at sf0.1); the distributed explode + (doc, n, gram)
  * aggregate costs three shuffles. This expression is one compiled pass
  * per document with an open hash map: O(total) work, zero shuffle, and
  * the gram keys are exactly the HOF's `concat_ws(" ", window)` strings
  * (UTF8String.concatWs — the same null-skipping concat `concat_ws`
  * uses), so counts are bit-identical to both other forms
  * (parity-spec'd in DataOpsSpec). Memory is O(distinct grams) per ROW —
  * for multi-MB pathological documents prefer the distributed aggregate
  * shape, which spills.
  *
  * Null semantics, matching the HOF form: a shorter-than-n token array has
  * zero grams → (0, 0, 0); a NULL array propagates NULL (like the HOF's
  * `transform`/`size` over a NULL input).
  */
case class NgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType = NgramStatsImpl.Schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ngram_stats"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else NgramStatsImpl.compute(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramStatsImpl.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)
}

object NgramStatsImpl {
  val Schema: StructType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("dup", LongType, nullable = false),
    StructField("top", LongType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  def compute(words: ArrayData, n: Int): InternalRow = {
    if (words == null || words.numElements() < n)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val len = words.numElements()
    // Materialize tokens once: getUTF8String per (window × position) would
    // re-decode each token n times.
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (words.isNullAt(i)) null else words.getUTF8String(i)
      i += 1
    }
    val total = (len - n + 1).toLong
    val counts = new java.util.HashMap[UTF8String, Array[Long]](
      math.min(total, 1 << 16).toInt)
    val window = new Array[UTF8String](n)
    i = 0
    while (i < len - n + 1) {
      var j = 0
      while (j < n) { window(j) = toks(i + j); j += 1 }
      // concatWs allocates a fresh UTF8String (safe to retain as a map
      // key) and skips nulls — the exact concat_ws(" ", ...) contract the
      // HOF shingle definition uses.
      val key = UTF8String.concatWs(Space, window: _*)
      val slot = counts.get(key)
      if (slot == null) counts.put(key, Array(1L)) else slot(0) += 1
      i += 1
    }
    var dup = 0L
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c >= 2L) dup += c
      if (c > top) top = c
    }
    new GenericInternalRow(Array[Any](total, dup, top))
  }
}

object NgramFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("ngram_stats")))
      registry.createOrReplaceTempFunction(
        "ngram_stats",
        exprs => exprs(1) match {
          case Literal(v: Int, IntegerType) => NgramStats(exprs.head, v)
          case other => throw new IllegalArgumentException(
            s"ngram_stats(words, n): n must be an integer literal, got $other")
        },
        "scala_udf")
  }

  /** Requires [[register]] on the session first. */
  def ngram_stats(words: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "ngram_stats", words, org.apache.spark.sql.functions.lit(n))
}
