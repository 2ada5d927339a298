package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Final-ordering helper for query outputs.
  *
  * Every registered query ends in a deterministic total sort so the driver
  * can hash-compare dumps. A plain `orderBy` is a range-partitioned sort
  * whose RangePartitioner first runs a SAMPLING JOB over the child plan —
  * i.e. the body computes twice (measured: +0.3 s/query at sf0.1 vs the
  * single-task sort). For these result-dump sorts the output is small
  * (aggregates, or bounded row sets), so one local sort of the final rows
  * is strictly cheaper and yields the same total order.
  *
  * `repartition(1)`, NOT `coalesce(1)`: coalesce propagates up to the
  * previous shuffle boundary, so a query whose body is shuffle-free (scan +
  * broadcast joins, e.g. J1/W1) would execute its ENTIRE body in one task —
  * measured 0.9–1.8 s/query at sf0.1 in round 1. repartition inserts a
  * round-robin exchange: the body keeps all cores, only the final sort of
  * the (small) result rows is single-task.
  *
  * At 100 TB a final presentation sort would stay `orderBy` (range sort,
  * parallel) — use [[ordered]] only where the sorted result is meant to be
  * consumed as one deterministic stream (verification dumps, single-file
  * CSV sinks per the reference's S7 contract).
  */
object Out {
  def ordered(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  def ordered(df: DataFrame, first: String, rest: String*): DataFrame =
    ordered(df, (first +: rest).map(col): _*)

  /** As [[ordered]] but via `coalesce(1)` — ONLY for bodies that END in a
    * shuffle (an aggregation or window): coalesce then collapses just the
    * final post-shuffle stage to one task (it reads all shuffle blocks
    * directly), removing the round-robin exchange that [[ordered]] inserts
    * — measured −170 ms on ref_q1_agg at sf0.1. On a shuffle-FREE body
    * (scan + broadcast joins) coalesce would instead serialize the whole
    * body into one task — use [[ordered]] there. */
  def orderedTail(df: DataFrame, first: String, rest: String*): DataFrame =
    df.coalesce(1).sortWithinPartitions((first +: rest).map(col): _*)

  /** `.dumpOrdered(...)` suffix syntax for query builders. */
  implicit class OrderedOps(private val df: DataFrame) extends AnyVal {
    def dumpOrdered(cols: Column*): DataFrame = ordered(df, cols: _*)
    def dumpOrdered(first: String, rest: String*): DataFrame =
      ordered(df, first, rest: _*)
    /** Dump sort for a body ending in a shuffle — see [[Out.orderedTail]]. */
    def dumpOrderedTail(first: String, rest: String*): DataFrame =
      orderedTail(df, first, rest: _*)
  }
}
