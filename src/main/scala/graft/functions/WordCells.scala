package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass non-overlapping word cells: `["a","b","c","d","e"], C=2` →
  * `[(0,"a b"), (1,"c d"), (2,"e")]` — the exact contract of the
  * composable HOF form used by the span-dedup family
  * (`when(n > 0, transform(sequence(0, (n+C-1) div C − 1),
  * i => struct(i, concat_ws(" ", slice(toks, i·C+1, C)))))`), and
  * therefore of every DuckDB cell oracle: same 0-based long chunk ids,
  * same shorter final cell, same null-word skipping inside concatWs.
  *
  * Why an expression: the HOF form pays ~2 interpreted lambda
  * dispatches per CELL with `slice` re-boxing each window, and it runs
  * on every corpus scan of the chunk/cell dedup family (corpus-wide
  * keeper election, the incremental screen's batch AND corpus sides,
  * the maintained-index build). One compiled pass per row instead —
  * words extracted once, `UTF8String.concatWs` per cell — the same
  * pattern (and measured motivation) as [[WordShingles]].
  *
  * Null semantics, matching the HOF exactly at the consumer: a NULL or
  * EMPTY word array yields the empty array — the HOF yields NULL there,
  * and every consumer explodes the result, where NULL and empty both
  * contribute zero rows (parity spec'd in DataOpsSpec).
  */
case class WordCells(child: Expression, c: Int) extends UnaryExpression {
  require(c >= 1, s"cell width must be >= 1, got $c")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_cells"

  override def eval(input: InternalRow): Any =
    WordCellsImpl.compute(child.eval(input).asInstanceOf[ArrayData], c)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Hand-rolled null plumbing (not defineCodeGen): a NULL child must
    // still produce the empty array — same shape as WordShingles.
    val ch = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        ${ch.code}
        $javaType ${ev.value} = graft.functions.WordCellsImpl.compute(
          ${ch.isNull} ? null : ${ch.value}, $c);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordCells =
    copy(child = newChild)
}

object WordCellsImpl {
  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(words: ArrayData, c: Int): ArrayData = {
    if (words == null) return Empty
    val m = words.numElements()
    if (m == 0) return Empty
    val nCells = (m + c - 1) / c
    val out = new Array[Any](nCells)
    var i = 0
    while (i < nCells) {
      val start = i * c
      val len = math.min(c, m - start)
      val win = new Array[UTF8String](len)
      var k = 0
      while (k < len) {
        win(k) = if (words.isNullAt(start + k)) null
          else words.getUTF8String(start + k)
        k += 1
      }
      out(i) = new GenericInternalRow(
        Array[Any](i.toLong, UTF8String.concatWs(Space, win: _*)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Registry + Column handle, same pattern as [[WordShingleFunctions]]. */
object WordCellFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("word_cells")))
      registry.createOrReplaceTempFunction(
        "word_cells",
        exprs => {
          if (exprs.length != 2) throw new IllegalArgumentException(
            s"word_cells(words, c): expected 2 arguments, got ${exprs.length}")
          exprs(1) match {
            case Literal(v: Int, IntegerType) => WordCells(exprs.head, v)
            case other => throw new IllegalArgumentException(
              s"word_cells(words, c): c must be an integer literal, got $other")
          }
        },
        "scala_udf")
  }

  /** Requires [[register]] on the session first. */
  def word_cells(words: Column, c: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "word_cells", words, org.apache.spark.sql.functions.lit(c))
}
