package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing selection over a hash array: the sorted distinct
  * 0-based positions of each `w`-window's minimum hash, leftmost on ties —
  * exactly the contract of the composable HOF form
  * ([[graft.data.TextAnalysis.winnowPositions]], the semantic definition
  * and the DuckDB oracle's shape; parity-spec'd in DataOpsSpec).
  *
  * Why an expression: the HOF form slices + re-scans each window
  * (`array_min` + `array_position` per window = O(n·w) INTERPRETED lambda
  * dispatches per document — the dominant term of the winnow query's 10×
  * scale tail). This is the classic monotonic-deque sliding-window
  * minimum: O(n) compiled comparisons total, each element pushed and
  * popped at most once. Strict `>` when popping keeps EQUAL earlier
  * elements ahead, which is precisely the leftmost-tie rule.
  *
  * Contract notes (matching the HOF): fewer hashes than one window →
  * select the global minimum; empty array → empty selection; NULL array →
  * NULL (propagated, exactly like the HOF's `transform`/`array_min`).
  * NULL elements never occur in the md5-hash inputs this serves; they are
  * skipped as candidates here (the HOF's `array_min` skips them too).
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_select"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else WinnowSelectImpl.compute(v.asInstanceOf[ArrayData], w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowSelectImpl.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelectImpl {

  def compute(hashes: ArrayData, w: Int): ArrayData = {
    // null is handled by the expression's null-propagation; the guard here
    // is defensive for direct callers.
    if (hashes == null || hashes.numElements() == 0)
      return new GenericArrayData(Array.empty[Long])
    val n = hashes.numElements()
    val h = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      h(i) = if (hashes.isNullAt(i)) null else hashes.getUTF8String(i)
      i += 1
    }
    if (n < w) {
      // short document: one window over everything -> the global leftmost min
      var best = -1
      i = 0
      while (i < n) {
        if (h(i) != null && (best < 0 || h(i).compareTo(h(best)) < 0)) best = i
        i += 1
      }
      return new GenericArrayData(
        if (best < 0) Array.empty[Long] else Array(best.toLong))
    }
    // Monotonic deque of candidate indices; values strictly increase from
    // front to back, equal values keep the earlier index in front.
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val selected = new java.util.TreeSet[Integer]()
    i = 0
    while (i < n) {
      if (h(i) != null) {
        while (tail > head && h(deque(tail - 1)).compareTo(h(i)) > 0) tail -= 1
        deque(tail) = i
        tail += 1
      }
      if (i >= w - 1) {
        val lo = i - w + 1 // window start
        while (tail > head && deque(head) < lo) head += 1
        if (tail > head) selected.add(deque(head))
      }
      i += 1
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().toLong; i += 1 }
    new GenericArrayData(out)
  }
}

/** Whole winnow-fingerprint pipeline in ONE compiled pass per document:
  * from the SHINGLE array straight to `struct(n_grams, n_fingerprints,
  * fp_md5)` — md5 of each shingle, deque window-minimum selection, and
  * the `md5(join(pos:hash, ','))` posting rollup, with no intermediate
  * hash array ever materialized as column data.
  *
  * Semantics are EXACTLY `winnowFingerprint`'s composable chain
  * (`transform(sh, md5)` → [[WinnowSelect]] → `md5(array_join(...))`),
  * which is also the DuckDB oracle's shape: minima compare RAW 16-byte
  * digests unsigned (hex encoding is nibble-monotone, so digest order ==
  * hex-string order — the [[MinHashSigImpl]] trick), and only selected
  * winners are hex-encoded into the rollup. Why: the HOF chain dispatches
  * interpreted lambdas per shingle (md5 transform) and per posting
  * (concat/element_at) — measured 4.1 s at 10× scale with the selection
  * already compiled; hashing dominated, not selection.
  */
case class WinnowFingerprint(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window must be >= 1, got $w")

  override def dataType: DataType = WinnowFingerprintImpl.Schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fingerprint"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else WinnowFingerprintImpl.compute(v.asInstanceOf[ArrayData], w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprintImpl.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprintImpl {
  val Schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_grams",
        LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_fingerprints",
        LongType, nullable = false),
      org.apache.spark.sql.types.StructField("fp_md5",
        org.apache.spark.sql.types.StringType, nullable = false)))

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".toCharArray

  private def hexOf(digest: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < digest.length) {
      sb.append(Hex((digest(i) >> 4) & 0xf)).append(Hex(digest(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** md5("") — the rollup of an empty posting join (immutable, shared). */
  private val EmptyRoll =
    UTF8String.fromString("d41d8cd98f00b204e9800998ecf8427e")

  def compute(shingles: ArrayData, w: Int): InternalRow = {
    if (shingles == null || shingles.numElements() == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L, EmptyRoll))
    val md = md5Local.get()
    val n = shingles.numElements()
    val dig = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        md.reset()
        dig(i) = md.digest(shingles.getUTF8String(i).getBytes)
      }
      i += 1
    }
    // window-minimum selection on raw digests (unsigned == hex order)
    val selected = new java.util.TreeSet[Integer]()
    if (n < w) {
      var best = -1
      i = 0
      while (i < n) {
        if (dig(i) != null && (best < 0 ||
            java.util.Arrays.compareUnsigned(dig(i), dig(best)) < 0)) best = i
        i += 1
      }
      if (best >= 0) selected.add(best)
    } else {
      val deque = new Array[Int](n)
      var head = 0
      var tail = 0
      i = 0
      while (i < n) {
        if (dig(i) != null) {
          while (tail > head &&
              java.util.Arrays.compareUnsigned(dig(deque(tail - 1)), dig(i)) > 0)
            tail -= 1
          deque(tail) = i
          tail += 1
        }
        if (i >= w - 1) {
          val lo = i - w + 1
          while (tail > head && deque(head) < lo) head += 1
          if (tail > head) selected.add(deque(head))
        }
        i += 1
      }
    }
    // rollup: md5 over the ASCII "pos:hex,pos:hex,..." posting join
    val sb = new java.lang.StringBuilder(selected.size() * 40)
    val it = selected.iterator()
    var first = true
    while (it.hasNext) {
      val p = it.next()
      if (!first) sb.append(',')
      first = false
      sb.append(p.intValue()).append(':').append(hexOf(dig(p)))
    }
    md.reset()
    val roll = md.digest(sb.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, selected.size().toLong,
        UTF8String.fromString(hexOf(roll))))
  }
}

object WinnowFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_select")))
      registry.createOrReplaceTempFunction(
        "winnow_select",
        exprs => exprs(1) match {
          case Literal(v: Int, IntegerType) => WinnowSelect(exprs.head, v)
          case other => throw new IllegalArgumentException(
            s"winnow_select(hashes, w): w must be an integer literal, got $other")
        },
        "scala_udf")
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fingerprint")))
      registry.createOrReplaceTempFunction(
        "winnow_fingerprint",
        exprs => exprs(1) match {
          case Literal(v: Int, IntegerType) => WinnowFingerprint(exprs.head, v)
          case other => throw new IllegalArgumentException(
            s"winnow_fingerprint(shingles, w): w must be an integer literal, got $other")
        },
        "scala_udf")
  }

  /** Requires [[register]] on the session first. */
  def winnow_select(hashes: Column, w: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "winnow_select", hashes, org.apache.spark.sql.functions.lit(w))

  /** Requires [[register]] on the session first. */
  def winnow_fingerprint(shingles: Column, w: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "winnow_fingerprint", shingles, org.apache.spark.sql.functions.lit(w))
}
