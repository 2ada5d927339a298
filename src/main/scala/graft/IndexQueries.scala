package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.{Indexing, TextAnalysis}
import graft.Out.OrderedOps

/** Registered queries for the [[graft.data.Indexing]] family: exact
  * substring (duplicate-span) removal, count-min heavy hitters, Bloom
  * decontamination, and the positional inverted index + phrase serving.
  * Every oracle replays the portable-md5 bucket arithmetic exactly, so
  * hashes — including the Bloom filter's deterministic false positives —
  * match bit-for-bit across engines.
  */
object IndexQueries {

  private val SpanN = 5    // duplicate-span n-gram length
  private val CmsD = 4     // count-min rows
  private val CmsW = 16    // count-min buckets per row (testdata-sized:
                           //   narrower than the vocab so collisions occur
                           //   and est >= exact is a real inequality)
  private val CmsTopK = 20
  private[graft] val BloomK = 3   // bloom hash functions
  private[graft] val BloomM = 4096 // bloom bits

  private val duckWords = "string_split_regex(text, '\\s+')"
  private def duckShingles(n: Int): String = {
    val parts = (0 until n).map(k => s"$duckWords[i+$k]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($duckWords) - ${n - 2}), i -> $parts)"
  }

  /** First-4-hex-digits md5 bucket — the DuckDB twin of
    * [[Indexing.seededBucket]] (same strpos arithmetic the classifier
    * oracle uses). `arg` is the full md5 argument incl. seed prefix. */
  private def duckBucket(arg: String, m: Int): String =
    DuckFrag.bucket(arg, m)

  // -- duplicate-span removal ------------------------------------------

  private def dedupSpans(spark: SparkSession, dir: String): DataFrame =
    Indexing.removeDupSpans(Tables.documentsHot(spark, dir),
        "doc_id", "text", SpanN)
      .dumpOrdered("doc_id")

  // -- count-min sketch heavy hitters ----------------------------------

  /** CMS estimates vs exact counts for the top-`CmsTopK` tokens. The
    * candidate selection is `orderBy().limit(k)` over the vocab-sized
    * exact aggregate — TakeOrderedAndProject (per-partition bounded
    * heaps, k-row driver merge), never a single-partition window over
    * the full vocab (billions of distinct tokens at raw-corpus scale;
    * at that scale the candidate set would come from the sketch + a
    * threshold, same serving join). */
  private def sketchCms(spark: SparkSession, dir: String): DataFrame = {
    // Three consumers (sketch build, exact counts, estimate probes) share
    // one memo-persisted token explode instead of re-splitting the corpus
    // three times (measured 3× at sf1).
    val toks = Tables.memoBy(spark, s"cmstoks:$dir") {
      Tables.documentsHot(spark, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    }
    val cms = Indexing.cmsTable(toks, "tok", CmsD, CmsW)
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(desc("exact_cnt"), col("tok"))
      .limit(CmsTopK)
    Indexing.cmsEstimate(cms, top, "tok", CmsD, CmsW)
      .select(col("tok").as("token"), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overcount"))
      .dumpOrdered(desc("exact_cnt"), col("token"))
  }

  // -- bloom decontamination -------------------------------------------

  /** Bloom-filter variant of `data_decontaminate`: same benchmark set
    * (distinct 3-gram shingles of docs 0–9), but membership goes through
    * a 4096-bit / 3-hash Bloom filter instead of the exact broadcast
    * set — the constant-size artifact you'd ship when the eval suite's
    * shingle set itself is too big to broadcast. False positives are
    * deterministic md5 arithmetic, so the oracle reproduces them. */
  private def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    // Materialize the token array BEFORE the shingle HOF: inlining
    // `tokens(text)` into shingles() re-evaluates the split per HOF
    // reference (the round-6 winnow pathology — measured 3.3 s → 0.5 s
    // for this explode at sf1).
    val sh = Tables.documentsHot(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(array_distinct(
        TextAnalysis.shingles(col("toks"), 3))).as("sh"))
    val bits = Indexing.bloomBits(
      sh.where(col("doc_id") < 10).select(col("sh")).distinct(),
      "sh", BloomK, BloomM)
    // Map-only probe path: the filter collapses to one m-char literal
    // (bounded model pull), so the corpus side is a single scan + ONE
    // per-doc aggregate — no probe-side join or (doc, shingle) shuffle.
    // IndexOpsSpec asserts equivalence with the join-form
    // bloomMightContain.
    val bitmap = Indexing.bloomBitmapString(bits, BloomM)
    sh.where(col("doc_id") >= 10)
      .withColumn("bloom_hit",
        Indexing.bloomHitColumn(bitmap, col("sh"), BloomK))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("bloom_hit"), lit(1))).as("n_flagged"))
      .select(col("doc_id"), col("n_shingles"), col("n_flagged"),
        (col("n_flagged") > 0).as("any_flagged"))
      .dumpOrderedTail("doc_id")
  }

  // -- hyperloglog distinct sketch --------------------------------------

  /** HLL distinct-user estimate per event type vs the exact count — ONE
    * scan, two map-side-combinable hash aggregates (values → 256
    * registers → estimate). The exact count rides the register aggregate
    * (buckets partition users, so per-bucket distincts sum exactly —
    * see [[Indexing.hllRegisters]]) instead of a second scan + join; it
    * exists purely for the differential and the accuracy columns — a
    * production run at 100 TB would ship the register table alone
    * (256 rows per group, mergeable by per-bucket MAX across corpus
    * shards). */
  private def sketchHll(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsHot(spark, dir)
      .where(col("event_type").isNotNull && col("user_id").isNotNull)
    Indexing.hllEstimate(
        Indexing.hllRegisters(e, "user_id", Seq("event_type")),
        Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("n_hit"),
        col("raw_est"), col("est_distinct"))
      .dumpOrdered("event_type")
  }

  // -- inverted index + phrase serving ---------------------------------

  /** Postings dumped with positions as a comma-joined string — the gate's
    * compare hashes scalar cells, not arrays (same convention as the
    * quantized-vector md5 dump). [[Indexing.postings]] keeps the real
    * array column. */
  private def searchPostings(spark: SparkSession, dir: String): DataFrame =
    Indexing.postings(Tables.documentsHot(spark, dir), "doc_id", "text")
      .select(col("term"), col("doc_id"), col("n_occ"),
        array_join(col("positions"), ",").as("positions_csv"))
      // The index is term-count-sized (1.5M rows at sf1) — the one dump
      // in the suite big enough that the single-task dump sort dominates
      // (2 s of 3.6 at sf1); use the parallel range sort, the documented
      // large-result path in Out.scala.
      .orderBy(col("term"), col("doc_id"))

  /** Phrase serving from the positional index: the corpus's most
    * frequent bigram (deterministic self-derived query), resolved by
    * joining two single-term slices of the occurrence table on
    * (doc, adjacent position) — the text is never rescanned. The top-1
    * pick is `orderBy().limit(1)` (TakeOrderedAndProject), never a
    * single-partition window over the bigram-count table (larger than
    * the vocab at corpus scale). */
  private def searchPhrase(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsHot(spark, dir)
    // Both phrase sides (t1 slice, t2 adjacency probe) read the same
    // occurrence relation — memo-persist it like the index it stands for.
    val occ = Tables.memoBy(spark, s"phraseocc:$dir") {
      Indexing.occurrences(docs, "doc_id", "text")
    }
    val top1 = docs
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(explode(TextAnalysis.shingles(col("toks"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("bg"))
      .limit(1)
      .select(col("bg").as("phrase"),
        split(col("bg"), " ").getItem(0).as("t1"),
        split(col("bg"), " ").getItem(1).as("t2"))
    val a = occ.join(broadcast(top1), occ("term") === top1("t1"))
      .select(col("doc_id"), col("pos"), col("phrase"), col("t2"))
    val b = occ.select(col("doc_id").as("d2"), (col("pos") - 1).as("p2"),
      col("term").as("term2"))
    a.join(b, col("doc_id") === col("d2") && col("pos") === col("p2") &&
        col("term2") === col("t2"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(count(lit(1)).as("n_matches"))
      .dumpOrderedTail("doc_id")
  }

  def defs: Seq[(String, Q)] = Seq(

    "data_dedup_spans" -> Q(dedupSpans, Some(
      s"""WITH t AS (
         |  SELECT doc_id, $duckWords AS toks FROM documents),
         |o AS (
         |  SELECT doc_id, unnest(range(0, len(toks) - ${SpanN - 1})) AS pos,
         |         toks
         |  FROM t WHERE len(toks) >= $SpanN),
         |oh AS (
         |  SELECT doc_id, pos,
         |    md5(array_to_string(toks[pos+1:pos+$SpanN], ' ')) AS h
         |  FROM o),
         |dup AS (SELECT h FROM oh GROUP BY h HAVING count(*) >= 2),
         |st AS (
         |  SELECT doc_id, list(pos ORDER BY pos) AS starts
         |  FROM oh JOIN dup USING (h) GROUP BY doc_id),
         |j AS (
         |  SELECT t.doc_id, t.toks, COALESCE(st.starts, []) AS starts
         |  FROM t LEFT JOIN st USING (doc_id)),
         |k AS (
         |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CASE WHEN toks IS NULL THEN NULL ELSE
         |      list_filter(range(0, len(toks)), i ->
         |        len(list_filter(starts,
         |          s -> s <= i AND i < s + $SpanN)) = 0) END AS kept
         |  FROM j)
         |SELECT doc_id, n_tokens,
         |  CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
         |  CAST(len(kept) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS kept_frac,
         |  CASE WHEN toks IS NULL THEN NULL ELSE
         |    COALESCE(array_to_string(list_transform(kept, i -> toks[i+1]),
         |                             ' '), '')
         |  END AS cleaned_text
         |FROM k ORDER BY doc_id""".stripMargin)),

    "data_sketch_cms" -> Q(sketchCms, Some(
      s"""WITH tok AS (SELECT unnest($duckWords) AS tok FROM documents),
         |cells AS (
         |  SELECT r, ${duckBucket("CAST(r AS VARCHAR) || '|' || tok", CmsW)}
         |           AS bucket,
         |         count(*) AS cnt
         |  FROM tok, (SELECT unnest(range(0, $CmsD)) AS r) s
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT tok, count(*) AS exact_cnt FROM tok GROUP BY tok
         |  ORDER BY exact_cnt DESC, tok LIMIT $CmsTopK),
         |pr AS (
         |  SELECT t.tok, t.exact_cnt, r,
         |    ${duckBucket("CAST(r AS VARCHAR) || '|' || t.tok", CmsW)} AS bucket
         |  FROM top t, (SELECT unnest(range(0, $CmsD)) AS r) s)
         |SELECT pr.tok AS token, pr.exact_cnt, min(c.cnt) AS est_cnt,
         |  min(c.cnt) - pr.exact_cnt AS overcount
         |FROM pr JOIN cells c USING (r, bucket)
         |GROUP BY pr.tok, pr.exact_cnt
         |ORDER BY exact_cnt DESC, token""".stripMargin)),

    "data_decontaminate_bloom" -> Q(decontaminateBloom, Some(
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(${duckShingles(3)})) AS sh
         |  FROM documents),
         |mem AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 10),
         |bits AS (
         |  SELECT DISTINCT
         |    ${duckBucket("CAST(r AS VARCHAR) || '|' || sh", BloomM)} AS bit
         |  FROM mem, (SELECT unnest(range(0, $BloomK)) AS r) s),
         |pr AS (
         |  SELECT p.doc_id, p.sh,
         |    ${duckBucket("CAST(r AS VARCHAR) || '|' || p.sh", BloomM)} AS bit
         |  FROM sh p, (SELECT unnest(range(0, $BloomK)) AS r) s
         |  WHERE p.doc_id >= 10),
         |hit AS (
         |  SELECT doc_id, sh, count(b.bit) = $BloomK AS bloom_hit
         |  FROM pr LEFT JOIN bits b USING (bit)
         |  GROUP BY doc_id, sh)
         |SELECT doc_id, count(*) AS n_shingles,
         |  count(CASE WHEN bloom_hit THEN 1 END) AS n_flagged,
         |  count(CASE WHEN bloom_hit THEN 1 END) > 0 AS any_flagged
         |FROM hit GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    "data_sketch_hll" -> Q(sketchHll, Some(
      s"""WITH e AS (
         |  SELECT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS h
         |  FROM events
         |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
         |hv AS (
         |  SELECT event_type, user_id,
         |    CAST(list_sum(list_transform(range(1, 3), i ->
         |      (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
         |        * 16 ** (2 - i))) AS BIGINT) AS bucket,
         |    CAST(list_sum(list_transform(range(3, 15), i ->
         |      (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
         |        * 16.0 ** (14 - i))) AS BIGINT) AS v
         |  FROM e),
         |regs AS (
         |  SELECT event_type, bucket,
         |    max(CASE WHEN v = 0 THEN 49
         |             ELSE 49 - length(bin(v)) END) AS mj
         |  FROM hv GROUP BY event_type, bucket),
         |agg AS (
         |  SELECT event_type, count(*) AS n_hit,
         |    sum(CAST(1 AS BIGINT) << CAST(49 - mj AS INTEGER)) AS s_hit
         |  FROM regs GROUP BY event_type),
         |ex AS (
         |  SELECT event_type, count(DISTINCT user_id) AS n_exact
         |  FROM e GROUP BY event_type),
         |r AS (
         |  SELECT a.event_type, ex.n_exact, a.n_hit,
         |    2.6499581405668102e19
         |      / CAST(a.s_hit + (256 - a.n_hit) * ${Indexing.HllEmptyTerm}
         |             AS DOUBLE) AS raw_est
         |  FROM agg a JOIN ex USING (event_type))
         |SELECT event_type, n_exact, n_hit, raw_est,
         |  CASE WHEN raw_est <= ${Indexing.HllSmallRange} AND n_hit < 256
         |       THEN ([${
                  // "e0"-suffixed so DuckDB types the list DOUBLE[] and
                  // parses each literal directly: a plain decimal list
                  // becomes DECIMAL(20,16)[], and its DECIMAL→DOUBLE
                  // promotion inside the CASE double-rounds (the scaled
                  // integer exceeds 2^53) — the 1-ulp sf0.001 mismatch
                  Indexing.HllLinearTable.map(_.toString + "e0")
                    .mkString(", ")}])
         |              [CAST(256 - n_hit AS INTEGER)]
         |       ELSE raw_est END AS est_distinct
         |FROM r ORDER BY event_type""".stripMargin)),

    "data_search_postings" -> Q(searchPostings, Some(
      s"""WITH t AS (
         |  SELECT doc_id, $duckWords AS toks FROM documents
         |  WHERE text IS NOT NULL),
         |p AS (SELECT doc_id, unnest(range(0, len(toks))) AS pos, toks FROM t),
         |o AS (SELECT toks[pos+1] AS term, doc_id, pos FROM p)
         |SELECT term, doc_id, count(*) AS n_occ,
         |  array_to_string(list(pos ORDER BY pos), ',') AS positions_csv
         |FROM o GROUP BY term, doc_id ORDER BY term, doc_id""".stripMargin)),

    "data_search_phrase" -> Q(searchPhrase, Some(
      s"""WITH t AS (
         |  SELECT doc_id, $duckWords AS toks FROM documents
         |  WHERE text IS NOT NULL),
         |p AS (SELECT doc_id, unnest(range(0, len(toks))) AS pos, toks FROM t),
         |o AS (SELECT toks[pos+1] AS term, doc_id, pos FROM p),
         |bg AS (
         |  SELECT unnest(${duckShingles(2)}) AS bg FROM documents),
         |top1 AS (
         |  SELECT bg AS phrase, string_split(bg, ' ')[1] AS t1,
         |         string_split(bg, ' ')[2] AS t2
         |  FROM (SELECT bg, count(*) AS cnt FROM bg GROUP BY bg
         |        ORDER BY cnt DESC, bg LIMIT 1)),
         |a AS (
         |  SELECT o.doc_id, o.pos, q.phrase, q.t2
         |  FROM o JOIN top1 q ON o.term = q.t1)
         |SELECT a.doc_id, a.phrase, count(*) AS n_matches
         |FROM a JOIN o b
         |  ON b.doc_id = a.doc_id AND b.pos - 1 = a.pos AND b.term = a.t2
         |GROUP BY a.doc_id, a.phrase ORDER BY a.doc_id""".stripMargin)))
}
