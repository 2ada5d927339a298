package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, StructType}

/** Single-pass argmax-row aggregate: for a group, return the payload-struct
  * fields taken at the maximum `ordKey` — the reference's
  * `MAX_BY(col, time)` × N fan-out (`exports_results.sql:51-81`) collapsed
  * into ONE aggregate evaluation.
  *
  * Why not N × `max_by`: Spark's declarative `Max_By` carries a string/struct
  * buffer, which `HashAggregateExec` cannot hold in its mutable fixed-width
  * row, so the plan degrades to **SortAggregate** — a per-partition sort of
  * every input row, and the ordering key is re-evaluated N times per row.
  * This class is a [[TypedImperativeAggregate]], which
  * `ObjectHashAggregateExec` holds as a plain JVM object: hash aggregation
  * (no sort), one ordKey evaluation per row, one buffer per group, and
  * map-side partial aggregation still applies — shuffle stays
  * O(distinct keys), exactly the 100 TB shape we want for the engine's core
  * dedup operator.
  *
  * Two modes:
  *  - `skipNullValues = true` (`argmax_fields`): DuckDB `MAX_BY` semantics —
  *    each field independently takes its value from the latest row where
  *    THAT field is non-NULL (equivalent to
  *    `max_by(c, when(c.isNotNull, ordKey))` per column).
  *  - `skipNullValues = false` (`argmax_row`): whole-row argmax — every
  *    field (NULLs included) comes from the single row with the maximum
  *    ordKey. Equivalent to unmasked `max_by(c, ordKey)` per column ONLY
  *    when ordKey is collision-free (e.g.
  *    [[graft.operators.DedupLatest.ordKey128]]); unlike the fan-out, the
  *    fields can never tear across tied rows even with a colliding key.
  *
  * Rows with a NULL ordKey are ignored (both DuckDB and Spark `max_by`
  * semantics). Ties on ordKey keep the first-seen row (both engines are
  * nondeterministic on ties; use a collision-free key for determinism).
  *
  * Buffer: flat `Array[Any]` of (ordKey, value) pairs per field, serialized
  * for shuffle via an [[UnsafeProjection]] over the pair schema — no Java
  * serialization, stable byte layout.
  */
case class ArgMaxFields(
    ordKey: Expression,
    payload: Expression,
    skipNullValues: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Any]] with BinaryLike[Expression] {

  @transient private lazy val payloadType: StructType =
    payload.dataType.asInstanceOf[StructType]
  @transient private lazy val n: Int = payloadType.length
  @transient private lazy val fieldTypes: Array[DataType] =
    payloadType.fields.map(_.dataType)
  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ordKey.dataType)
  /** Buffer slot layout: [ord_0, val_0, ord_1, val_1, …]. */
  @transient private lazy val bufTypes: Array[DataType] =
    Array.tabulate(2 * n)(i => if (i % 2 == 0) ordKey.dataType else fieldTypes(i / 2))
  @transient private lazy val bufProj: UnsafeProjection =
    UnsafeProjection.create(bufTypes)

  override def left: Expression = ordKey
  override def right: Expression = payload
  override def nullable: Boolean = false
  override def dataType: DataType = payloadType
  override def prettyName: String =
    if (skipNullValues) "argmax_fields" else "argmax_row"

  override def createAggregationBuffer(): Array[Any] = new Array[Any](2 * n)

  override def update(buf: Array[Any], input: InternalRow): Array[Any] = {
    val k = ordKey.eval(input)
    if (k != null) {
      val row = payload.eval(input).asInstanceOf[InternalRow]
      if (row != null) {
        if (skipNullValues) {
          // Fast path: winning rows write ONE shared kCopy into every
          // non-null field's ord slot, so a buffer whose history had no
          // nulls holds n references to the SAME object — n pointer
          // checks + ONE ordering.compare then decide the whole row
          // (the ordKey is a Decimal(38) in the a1 shape: each compare
          // is a BigDecimal compareTo, and most rows LOSE, so this
          // collapses 16 of them into 1 on the hot path). A null
          // anywhere in history diverges the slots and the general
          // per-field loop below takes over — same results either way.
          val b0 = buf(0)
          var uniform = b0 != null
          var s = 1
          while (uniform && s < n) {
            uniform = buf(2 * s).asInstanceOf[AnyRef]
              .eq(b0.asInstanceOf[AnyRef])
            s += 1
          }
          if (uniform) {
            if (ordering.compare(k, b0) > 0) {
              var kCopy: Any = null
              var i = 0
              while (i < n) {
                val v = row.get(i, fieldTypes(i))
                if (v != null) {
                  if (kCopy == null) kCopy = InternalRow.copyValue(k)
                  buf(2 * i) = kCopy
                  buf(2 * i + 1) = InternalRow.copyValue(v)
                }
                i += 1
              }
            }
          } else {
            var kCopy: Any = null // copy the key at most once per input row
            var i = 0
            while (i < n) {
              val v = row.get(i, fieldTypes(i))
              if (v != null) {
                val cur = buf(2 * i)
                if (cur == null || ordering.compare(k, cur) > 0) {
                  if (kCopy == null) kCopy = InternalRow.copyValue(k)
                  buf(2 * i) = kCopy
                  buf(2 * i + 1) = InternalRow.copyValue(v)
                }
              }
              i += 1
            }
          }
        } else {
          val cur = buf(0)
          if (cur == null || ordering.compare(k, cur) > 0) {
            val kCopy = InternalRow.copyValue(k)
            var i = 0
            while (i < n) {
              buf(2 * i) = kCopy
              val v = row.get(i, fieldTypes(i))
              buf(2 * i + 1) = if (v == null) null else InternalRow.copyValue(v)
              i += 1
            }
          }
        }
      }
    }
    buf
  }

  override def merge(a: Array[Any], b: Array[Any]): Array[Any] = {
    if (skipNullValues) {
      var i = 0
      while (i < n) {
        val bo = b(2 * i)
        if (bo != null && (a(2 * i) == null || ordering.compare(bo, a(2 * i)) > 0)) {
          a(2 * i) = bo
          a(2 * i + 1) = b(2 * i + 1)
        }
        i += 1
      }
    } else if (b(0) != null && (a(0) == null || ordering.compare(b(0), a(0)) > 0)) {
      System.arraycopy(b, 0, a, 0, 2 * n)
    }
    a
  }

  override def eval(buf: Array[Any]): Any =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array.tabulate[Any](n)(i => buf(2 * i + 1)))

  override def serialize(buf: Array[Any]): Array[Byte] =
    bufProj(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(buf))
      .getBytes

  override def deserialize(bytes: Array[Byte]): Array[Any] = {
    val row = new UnsafeRow(2 * n)
    row.pointTo(bytes, bytes.length)
    // Copy out: UTF8String/struct getters point into `bytes`, which is only
    // borrowed during deserialization.
    Array.tabulate[Any](2 * n)(i =>
      InternalRow.copyValue(row.get(i, bufTypes(i))))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxFields =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxFields =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxFields =
    copy(ordKey = newLeft, payload = newRight)
}

/** Registry + Column-API handles, same pattern as [[VectorFunctions]]. */
object ArgMaxFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def reg(name: String, skipNulls: Boolean): Unit =
      if (!registry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(
          name,
          exprs => ArgMaxFields(
            exprs.head,
            org.apache.spark.sql.catalyst.expressions.CreateStruct(exprs.tail),
            skipNullValues = skipNulls),
          "scala_udf")
    reg("argmax_fields", skipNulls = true)
    reg("argmax_row", skipNulls = false)
  }

  /** DuckDB-MAX_BY-faithful per-field argmax: returns a struct of the
    * payload columns, each taken at the max `ordKey` among rows where that
    * column is non-NULL. Requires [[register]] on the session first. */
  def argmax_fields(ordKey: Column, payload: Column*): Column =
    org.apache.spark.sql.functions.call_function(
      "argmax_fields", (ordKey +: payload): _*)

  /** Whole-row argmax: struct of the payload columns from the single row
    * with the maximum `ordKey`. Requires [[register]] first. */
  def argmax_row(ordKey: Column, payload: Column*): Column =
    org.apache.spark.sql.functions.call_function(
      "argmax_row", (ordKey +: payload): _*)
}
