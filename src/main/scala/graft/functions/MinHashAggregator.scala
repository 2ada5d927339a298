package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: a k-element MinHash signature over a GROUP of
  * shingles (e.g. all shingles of a document cluster), usable as a typed
  * column or via `udaf(...)` in untyped aggregation.
  *
  * Complements the expression-level `Dedup.minhashSig` (per-row over an
  * array column): the Aggregator form streams shingle ROWS through a
  * fixed-size buffer — the signature state is k strings regardless of
  * group size, merged associatively (elementwise min), so map-side partial
  * aggregation applies and shuffle stays O(groups × k) at any scale.
  *
  * Hashing matches the rest of the engine (and any SQL oracle):
  * lowercase-hex `md5("<seed>|<shingle>")`, lexicographic minima.
  */
class MinHashAggregator(k: Int)
    extends Aggregator[String, Array[String], Array[String]] {

  override def zero: Array[String] = Array.fill(k)(null)

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    if (shingle != null) {
      var i = 0
      while (i < k) {
        val h = md5hex(s"$i|$shingle")
        if (buf(i) == null || h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(reduction: Array[String]): Array[String] = reduction

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}

/** Typed `Aggregator` merging PRE-COMPUTED per-row MinHash signatures
  * (k-element string arrays, e.g. from the compiled
  * `graft.functions.MinHashSig` expression) into one group signature by
  * element-wise lexicographic minimum, skipping nulls.
  *
  * Because min is associative, `min over a group's shingle multiset ==
  * elementwise-min over the group's per-row signatures` — so a group
  * signature can be built from map-only per-row sigs plus this O(groups×k)
  * aggregate, with NO explode of shingles and NO distinct shuffle. The
  * md5 hashing happens once, compiled, in the per-row projection; this
  * aggregator only compares 32-char strings. Rows whose shingle array was
  * empty/NULL carry all-null sigs and contribute nothing, matching SQL
  * `min`'s null-skipping.
  */
class MinHashMergeAggregator(k: Int)
    extends Aggregator[Seq[String], Array[String], Array[String]] {

  override def zero: Array[String] = Array.fill(k)(null)

  override def reduce(buf: Array[String], sig: Seq[String]): Array[String] = {
    if (sig != null) {
      var i = 0
      while (i < k) {
        val v = sig(i)
        if (v != null && (buf(i) == null || v < buf(i))) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(reduction: Array[String]): Array[String] = reduction

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
