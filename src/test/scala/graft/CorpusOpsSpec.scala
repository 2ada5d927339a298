package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan-shape guards for the round-5 corpus-curation operators
  * (chunk-level dedup, unigram scoring, blocklist exclusion, rolling
  * features). Correctness vs DuckDB is the oracle's job; these lock the
  * properties the oracle can't see — keep-one-copy invariants and the
  * shuffle/operator shapes that make the queries scale.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(name: String): String =
    Registry.byName(name).build(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("chunk dedup keeps each distinct cell exactly once, corpus-wide") {
    val df = Registry.byName("data_chunk_dedup").build(spark, TestSpark.sf)
      .agg(sum($"n_kept"), sum($"n_chunks")).as[(Long, Long)].head()
    val (kept, total) = df
    // every distinct cell hash survives exactly once
    val C = 16
    val distinctCells = Tables.documents(spark, TestSpark.sf)
      .withColumn("toks", split($"text", "\\s+"))
      .withColumn("n", size($"toks").cast("long"))
      .select(explode(transform(
        sequence(lit(0L), expr(s"(n + ${C - 1}) div $C") - 1),
        i => concat_ws(" ", slice($"toks", (i * C + 1).cast("int"), lit(C))))))
      .distinct().count()
    assert(kept == distinctCells, "n_kept must sum to #distinct cells")
    assert(kept <= total)
  }

  test("chunk dedup elects keepers via aggregate, not a window over hashes") {
    // A window over md5(chunk) would sort the hot partition when one
    // boilerplate cell occurs everywhere; the map-side-combinable
    // min(struct) aggregate is the skew-immune shape.
    val p = plan("data_chunk_dedup")
    assert(!p.contains("Window"), s"unexpected Window in:\n$p")
  }

  test("blocklist exclusion plans a broadcast LEFT ANTI join") {
    val p = plan("data_filter_blocklist")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast anti-join in:\n$p")
  }

  test("rolling features plan exactly one Window and one hash exchange") {
    // All five window columns share (partitionBy user_id, orderBy ts_us,
    // event_id) so Spark must collapse them into ONE Window operator fed
    // by ONE exchange + sort — five separate sorts would be the
    // anti-pattern.
    val p = plan("data_event_rolling")
    assert("Window \\[".r.findAllIn(p).size == 1,
      s"expected a single Window operator in:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected a single hash exchange in:\n$p")
  }

  test("rolling features are deterministic under time collisions") {
    // Two purchases at the same (user, ts): frame order falls back to
    // event_id by construction, so lag/rolling outputs are fixed.
    val ev = Seq(
      (1L, 100L, 10L, "purchase", 1.0),
      (2L, 100L, 10L, "purchase", 2.0),
      (3L, 200L, 10L, "purchase", 4.0)
    ).toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val got = ev.where($"event_type" === "purchase")
      .select($"event_id", $"ts_us", $"user_id",
        round($"value" * 100).cast("long").as("cents"))
      .withColumn("prev", lag($"cents", 1).over(w))
      .select($"event_id", $"cents", $"prev")
      .orderBy("event_id").as[(Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq((1L, 100L, None), (2L, 200L, Some(100L)),
      (3L, 400L, Some(200L))))
  }

  test("unigram scores: constant-text corpus scores uniformly") {
    val docs = Seq((1L, "a a b"), (2L, "a a b")).toDF("doc_id", "text")
    val toks = docs.select($"doc_id", explode(split($"text", "\\s+")).as("token"))
    val vocab = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
    val scored = toks.join(broadcast(vocab), Seq("token"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"), sum($"cnt").as("sum_tf"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // each 'a' occurrence carries corpus tf 4, each 'b' carries 2 → 4+4+2
    assert(scored == Seq((1L, 3L, 10L), (2L, 3L, 10L)))
  }
}
