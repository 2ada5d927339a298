package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: a K-Minimum-Values (KMV / bottom-k) distinct-count
  * sketch over PORTABLE md5 hex hashes.
  *
  * State is the k lexicographically-smallest distinct `md5(value)` hex
  * strings seen — a fixed-size buffer merged associatively (sorted-merge,
  * keep k smallest), so map-side partial aggregation applies and the
  * shuffle is O(groups × k) no matter the data volume: the same 100 TB
  * story as HLL, but — unlike HLL registers — the sketch VALUE is
  * engine-independent. Any engine that can md5 and sort strings produces
  * the byte-identical sketch, so the driver's DuckDB oracle hash-compares
  * the sketch itself (see `data_sketch_kmv`), where HLL/GK outputs can
  * only be oracled via tolerance booleans (`ref_sketch_approx`).
  *
  * The standard KMV estimator rides on top: with the k-th smallest hash
  * interpreted as a fraction U of the hash space, distinct ≈ (k-1)/U
  * (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  * stream"). The query layer computes it from the sketch with exact
  * integer-in-double arithmetic so both engines agree bit-for-bit.
  */
class KmvAggregator(k: Int)
    extends Aggregator[String, List[String], Seq[String]] {
  require(k > 0, s"KMV sketch size must be positive, got $k")

  override def zero: List[String] = Nil

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Insert into the sorted ≤k buffer, dropping duplicates and anything
    * beyond the k smallest. Fast path first: once the sketch is
    * saturated, almost every hash is ≥ the current k-th minimum and is
    * rejected with one comparison (buf is sorted ascending, so buf.last
    * is the k-th minimum) — the per-row cost that matters when this
    * streams a whole table. */
  private def insert(buf: List[String], h: String): List[String] = {
    if (buf.lengthCompare(k) == 0 && h >= buf.last) buf
    else if (buf.contains(h)) buf
    else {
      val merged = (h :: buf).sorted
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }
  }

  override def reduce(buf: List[String], value: String): List[String] =
    if (value == null) buf else insert(buf, md5hex(value))

  override def merge(a: List[String], b: List[String]): List[String] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(reduction: List[String]): Seq[String] = reduction

  override def bufferEncoder: Encoder[List[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
