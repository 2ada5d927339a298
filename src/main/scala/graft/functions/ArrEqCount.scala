package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** `arr_eq_count(a, b)` — positions where two string arrays agree — the
  * hot inner loop of MinHash-signature comparison (fuzzy decontamination
  * compares every corpus document's K-component signature against every
  * eval signature: |corpus| × |eval| × K element equalities).
  *
  * The composable form `size(filter(zip_with(a, b, _ === _), x => x))`
  * is semantically identical but runs ~3 interpreted lambda dispatches
  * per component and materializes the boolean array per pair; this is
  * one primitive loop inside whole-stage codegen (the same move as
  * `vec_dot`/`vec_sqdist`/`word_shingles` — VectorExprSpec asserts
  * bit-parity with the HOF on random inputs).
  *
  * Semantics, matching the HOF exactly on non-null arrays: positions
  * beyond the shorter array never match (zip_with pads with null, null
  * equality is null, filter drops it), and a NULL element on either side
  * never matches. NULL if either ARRAY is null (BinaryExpression default;
  * the HOF's `size(null)` differs — signatures are never null on the
  * query path, and the parity spec pins non-null inputs).
  */
case class StrArrEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "arr_eq_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrEqCountImpl.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrEqCountImpl.count($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrEqCountImpl {
  def count(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) &&
          x.getUTF8String(i) == y.getUTF8String(i)) c += 1
      i += 1
    }
    c
  }
}

/** Registry + Column handle, same pattern as [[VectorFunctions]]. */
object ArrEqCountFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("arr_eq_count")))
      registry.createOrReplaceTempFunction(
        "arr_eq_count",
        VectorFunctions.binaryBuilder("arr_eq_count", StrArrEqCount.apply),
        "scala_udf")
  }

  /** Requires [[register]] on the session first. */
  def arr_eq_count(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("arr_eq_count", a, b)
}
