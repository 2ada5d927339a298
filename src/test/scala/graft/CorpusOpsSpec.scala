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

  test("tfidf retrieval broadcasts queries and idf; corpus joins are equi") {
    val p = plan("data_tfidf_topk")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"expected broadcast joins for query terms and idf model in:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"expected bounded-heap per-query top-k in:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian in:\n$p")
  }

  test("bpe pair top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("data_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected partial top-k merge in:\n$p")
  }

  test("bpe pair extraction yields no pairs for single-token docs") {
    // sequence(1, 0) generates DESCENDING [1, 0]; the CASE guard must
    // suppress it rather than emitting a (t[0], null) pair.
    val df = Seq("solo", "a b c").toDF("text")
      .select(split($"text", "\\s+").as("t"))
      .select(explode(expr(
        """CASE WHEN size(t) >= 2
          |  THEN transform(sequence(1, size(t) - 1),
          |                 i -> struct(t[i-1] AS a, t[i] AS b))
          |  ELSE cast(null AS array<struct<a:string,b:string>>) END"""
          .stripMargin)).as("p"))
      .select($"p.a", $"p.b").orderBy("a", "b")
      .as[(String, String)].collect().toSeq
    assert(df == Seq(("a", "b"), ("b", "c")))
  }

  test("quality threshold: window runs over the value histogram, not docs") {
    val p = plan("data_quality_threshold")
    // executedPlan prints top-down: the Window node must sit ABOVE the
    // n_tok histogram aggregate (its input), never above a raw doc scan.
    val w = p.indexOf("Window")
    val h = p.indexOf("HashAggregate(keys=[n_tok")
    assert(w >= 0 && h >= 0 && w < h,
      s"expected Window fed by the n_tok histogram aggregate in:\n$p")
    // and the gate keeps at least the top quartile
    val rows = Registry.byName("data_quality_threshold")
      .build(spark, TestSpark.sf)
    val n = Tables.documents(spark, TestSpark.sf).count()
    val kept = rows.count()
    assert(kept * 4 >= n && kept < n, s"p75 gate kept $kept of $n")
  }

  test("fuzzy join is block-equi, never cartesian; pairs are canonical") {
    val p = plan("data_fuzzy_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"expected blocked equi-join in:\n$p")
    val rows = Registry.byName("data_fuzzy_join").build(spark, TestSpark.sf)
      .select($"key_a", $"key_b", $"dist").as[(Long, Long, Long)]
      .collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, d) => a < b && d == 1 })
  }

  test("cdc apply: deleted keys are suppressed, aggregation is map-side") {
    val p = plan("data_cdc_apply")
    assert(p.contains("partial_max_by"),
      s"expected map-side partial max_by in:\n$p")
    // semantics on a synthetic changelog: user 1 ends on an upsert, user 2
    // ends on a delete (tombstone) and must vanish from the final state.
    // Uses the PRODUCTION ordering key (DedupLatest.ordKey128) — the
    // collision-free composite cdcApply ships — with a deliberate ts tie
    // (events 3 and 1027 for user 1) whose event_ids collide mod 1024, the
    // exact case the old `ts*1024 + id%1024` composite mis-ordered.
    val ev = Seq(
      (1L, 100L, 1L, "purchase", 1.0),
      (2L, 200L, 1L, "error", 0.0),
      (3L, 300L, 1L, "view", 2.0),
      (1027L, 300L, 1L, "view", 3.0), // ts tie with event 3; 1027 % 1024 == 3
      (4L, 100L, 2L, "purchase", 1.0),
      (5L, 200L, 2L, "error", 0.0)
    ).toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val ck = graft.operators.DedupLatest.ordKey128($"ts_us", $"event_id")
    val state = ev
      .withColumn("op", when($"event_type" === "error", "D").otherwise("U"))
      .groupBy($"user_id")
      .agg(max_by($"event_id", ck).as("last_event_id"),
        max_by($"op", ck).as("last_op"))
      .where($"last_op" === "U")
      .select($"user_id", $"last_event_id")
      .orderBy("user_id").as[(Long, Long)].collect().toSeq
    // tie on ts_us=300 broken by event_id: 1027 wins (the mod-1024
    // composite would have seen equal keys and picked either)
    assert(state == Seq((1L, 1027L)))
  }

  test("cohort retention and funnel are aggregate-only — no event window") {
    // Both ops could be written as windows over the per-user event
    // timeline; the aggregate+join form keeps partial aggregation and
    // avoids sorting user partitions.
    for (name <- Seq("data_retention_cohort", "data_funnel")) {
      val p = plan(name)
      assert(!p.contains("Window ["), s"unexpected Window in $name:\n$p")
      assert(p.contains("partial_"), s"expected partial aggregation in $name")
    }
  }

  test("time bucketing is one map-side-combinable aggregate") {
    val p = plan("data_time_bucket")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"expected partial aggregation in:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected a single hash exchange in:\n$p")
  }

  test("shard plan: window partitions by shard, positions are contiguous") {
    val p = plan("data_shard_plan")
    val winLine = p.linesIterator.find(_.contains("Window [")).getOrElse("")
    assert(winLine.contains("shard"),
      s"row_number window must partition by shard, got:\n$winLine")
    val byShard = Registry.byName("data_shard_plan")
      .build(spark, TestSpark.sf)
      .groupBy($"shard").agg(count(lit(1)).as("n"), max($"pos").as("mx"),
        min($"pos").as("mn"))
      .as[(Long, Long, Long, Long)].collect()
    assert(byShard.nonEmpty)
    assert(byShard.forall { case (_, n, mx, mn) => mn == 1L && mx == n },
      "positions must be 1..n within each shard")
  }

  test("source overlap joins on the shingle key, never doc-level pairs") {
    val p = plan("data_source_overlap")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian in:\n$p")
    val rows = Registry.byName("data_source_overlap")
      .build(spark, TestSpark.sf)
      .select($"n_shared", $"n_a", $"n_b", $"jaccard")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (s, a, b, j) =>
      s <= math.min(a, b) && j >= 0.0 && j <= 1.0 })
  }

  test("z-order ranges bound BOTH dimension spans at once") {
    // The point of the Morton layout: a single-column sort gives narrow
    // spans on one dimension only; z-ranges must average well under the
    // global domain on user AND hour buckets simultaneously, or the
    // interleave is wrong and min/max skipping buys nothing.
    val stats = Registry.byName("data_zorder_layout")
      .build(spark, TestSpark.sf)
      .select($"n_events", $"ub_max" - $"ub_min", $"hb_max" - $"hb_min")
      .as[(Long, Long, Long)].collect()
    assert(stats.length > 1)
    def meanSpan(f: ((Long, Long, Long)) => Long) =
      stats.map(f).sum.toDouble / stats.length
    assert(meanSpan(_._2) <= 1024 / 4.0, s"user span too wide: $stats")
    assert(meanSpan(_._3) <= 1024 / 4.0, s"hour span too wide: $stats")
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

  test("scd2 history: interval laws and SCD1 consistency with cdc apply") {
    val hist = Registry.byName("data_scd2_history").build(spark, TestSpark.sf)
      .select($"user_id", $"version", $"valid_from_us", $"valid_to_us",
        $"cents", $"is_current")
      .as[(Long, Long, Long, Option[Long], Long, Boolean)].collect().toSeq
    assert(hist.nonEmpty)
    val byUser = hist.groupBy(_._1)
    byUser.values.foreach { h =>
      val s = h.sortBy(_._2)
      // versions are 1..k, intervals ordered and non-overlapping; only
      // the LAST version may be open-ended
      assert(s.map(_._2) == (1L to s.size.toLong))
      s.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4.isDefined, "non-final version must be closed")
          assert(a._4.get <= b._3, "intervals overlap")
          assert(a._3 <= a._4.get, "negative interval")
        case _ => ()
      }
      assert(s.count(_._6) <= 1, "more than one current version")
      assert(s.forall(v => v._6 == v._4.isEmpty))
    }
    // SCD1 cross-check: cdc apply's survivors are exactly the users whose
    // history ends OPEN (an upsert was last), with the same final cents.
    val scd1 = Registry.byName("data_cdc_apply").build(spark, TestSpark.sf)
      .select($"user_id", $"last_cents").as[(Long, Long)].collect().toMap
    val open = byUser.view.mapValues(_.find(_._6)).toMap
    open.foreach { case (u, cur) =>
      cur match {
        case Some(v) => assert(scd1.get(u).contains(v._5),
          s"user $u: scd1 cents ${scd1.get(u)} != open version ${v._5}")
        case None => assert(!scd1.contains(u),
          s"user $u ended on a tombstone but survives scd1")
      }
    }
    // tombstone-ended users exist at this sf, so the law is not vacuous
    assert(open.values.exists(_.isEmpty))
  }
}
