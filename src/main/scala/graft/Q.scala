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
  *    a unique key set, aggregates of doubles go through DECIMAL(18,2) so
  *    both engines produce bit-identical values.
  */
final case class Q(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
