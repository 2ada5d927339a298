package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a DataFrame builder over a testdata directory and,
  * when SQL-expressible, an equivalent DuckDB oracle SQL (run by the driver
  * over the same parquet tables; results hash-compared after sorting columns
  * by name). `headline` marks queries timed by [[Bench]].
  *
  * Contract notes (see the driver docs in the repo root):
  *  - column names/aliases must match between builder output and oracle SQL;
  *  - results must be deterministic: every query ends in a total ORDER BY on
  *    a unique key set; aggregates of doubles run cents-exact (integer
  *    cents or DECIMAL) and the FINAL column is cast to DOUBLE on both
  *    engine sides — raw DECIMAL outputs hash-fail on precision widening
  *    (Spark keeps (18,2), DuckDB's sum widens to (38,2)), and timestamps
  *    are emitted as unix_micros or formatted strings for the same reason.
  */
final case class Q(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Shared DuckDB oracle fragments — arithmetic that must stay
  * bit-identical to a Spark-side twin lives in ONE string template. */
object DuckFrag {

  /** DuckDB twin of [[graft.data.Indexing.seededBucket]] (first-4-hex-
    * digit md5 bucket mod m). `arg` is the full md5 argument including
    * any seed prefix. A second hand-maintained copy of this strpos
    * arithmetic is how an oracle silently diverges — delegate, never
    * re-type. */
  def bucket(arg: String, m: Int): String =
    s"(CAST(list_sum(list_transform(range(1, 5), i -> " +
      s"(strpos('0123456789abcdef', substr(md5($arg), i, 1)) - 1) " +
      s"* 16 ** (4 - i))) AS BIGINT) % $m)"
}
