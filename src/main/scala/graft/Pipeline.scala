package graft

import graft.Out.OrderedOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** The flagship end-to-end composite: the reference pipeline's full stage
  * order (exports_results.sql + run_exports_query.py traced in SURVEY.md §3)
  * re-expressed over the driver testdata star schema —
  *
  *   time-range filter (P2) → latest-per-key argmax dedup (A1) →
  *   explode-with-default (O5) → order-sensitive classification (F10) →
  *   global aggregates via broadcast crossJoin, not OVER () (W1–W3) →
  *   broadcast dimension enrichment (J1) → 3-month rank/pivot features
  *   (P12/A3/W4/O3/O4/J2) → final projection + total sort (P7/O1).
  *
  * Single-pass over the fact tables (the reference re-runs its query once
  * per lender — ~49 scans; here every "lender" row comes out of one plan).
  */
object Pipeline {

  def monthlyReport(spark: SparkSession, dir: String): DataFrame = {
    // P2: half-open validity window — pushed down to the parquet scan.
    val deals = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
             col("o_orderdate") < lit("1997-07-01").cast("timestamp"))

    val lines = Tables.lineitem(spark, dir)

    // A1 + O5 input in ONE aggregation pass over lineitem (one scan, one
    // shuffle): the argmax "latest line" columns and the collected matching
    // items come from the same groupBy. Ties on shipdate/linenumber are
    // broken with a composite numeric key — (shipdate, linenumber,
    // quantity) is duplicate-free per order, making max_by deterministic.
    val ordKey = unix_timestamp(col("l_shipdate")) * 10000000L +
      col("l_linenumber") * 10000L + (col("l_quantity") * 100).cast("long")
    val lineAgg = lines.groupBy(col("l_orderkey")).agg(
      max_by(col("l_quantity"), ordKey).as("latest_line_qty"),
      max_by(col("l_returnflag"), ordKey).as("latest_line_flag"),
      date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("last_ship_day"),
      collect_list(when(col("l_returnflag") === "R",
        struct(col("l_linenumber"), col("l_quantity")))).as("items"))

    // J1: ONE pre-explode base — deals ⋈ lineAgg (1:1) ⋈ broadcast dims —
    // cached because three consumers share it (feature build, global agg,
    // main chain); Spark's cache manager dedupes by logical plan, so
    // repeated invocations reuse one InMemoryRelation. Base is one row per
    // deal — O(deals), never O(lineitems).
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    // customer scales with the data — no broadcast hint (AQE picks
    // broadcast at small sf, shuffle join at scale); nation is bounded.
    val base = deals
      .join(lineAgg.withColumnRenamed("l_orderkey", "lk_items"),
        deals("o_orderkey") === col("lk_items"), "left")
      .drop("lk_items")
      .join(c, deals("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .persist()

    // P12/A3/W4/O3/O4: 3-month rank/pivot features — computed pre-explode
    // with fan-out multiplicity as the weight (identical counts to the
    // post-explode formulation, one fewer pass over exploded rows).
    val months = RankFeatures.lookbackMonths(java.time.LocalDate.parse("1997-06-01"))
    val mult = greatest(size(col("items")), lit(1))
    val feat = RankFeatures.rankPivot(
      base.select(col("c_mktsegment").as("tier"),
        col("o_orderpriority").as("entity"), col("o_orderdate"), mult.as("mult")),
      "tier", "entity",
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM"), months,
      weight = Some(col("mult")))

    // W1/W3: global aggregates (base is 1:1 with deals), broadcast back.
    // Cents-scaled long sum (codegen path), emitted as DOUBLE — the
    // cross-engine output type (DECIMAL only hash-matched while the value
    // carried non-zero cents; see RefQueries.a2CollectFilter).
    // `o_orderkey` is orders' primary key and every join above is 1:1
    // (lineAgg/customer/nation are keyed lookups), so base holds exactly
    // one row per deal and the reference's COUNT(DISTINCT o_orderkey) ≡
    // count(o_orderkey): the distinct-rewrite's O(deals) extra exchange
    // is pure waste on unique keys. Oracle keeps COUNT(DISTINCT …); the
    // hash differential pins the equivalence at every SF.
    val glob = base.agg(
      count(col("o_orderkey")).as("n_deals_global"),
      (sum(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100)
        .as("sum_price_global"))

    // O5: explode with a stub default so every deal survives
    // (exports_results.sql:117-134 semantics; collect_list drops the NULLs
    // left by the when() filter, same as list_filter-non-null).
    val stub = struct(lit(0).as("l_linenumber"), lit(0.0).as("l_quantity"))
    val enriched = base
      .withColumn("item", ExplodeDefault.explodeWithDefault(col("items"), stub))
      .withColumn("linenumber", col("item.l_linenumber"))
      .withColumn("quantity", col("item.l_quantity"))
      .drop("items", "item")

    // F10: order-sensitive performance classification.
    val performance =
      when(col("linenumber") === 0, "Deals Not Exported")
        .when(col("quantity") >= 45, "Export Winner Deals")
        .when(col("quantity") >= 25, "Failed In Scope Deals")
        .otherwise("Failed Out of Scope Deals")

    // J2 + final projection + total sort (latest-line columns already ride
    // on `base`, so no further join is needed for them).
    enriched
      .crossJoin(broadcast(glob))
      .join(broadcast(feat),
        enriched("c_mktsegment") === feat("tier") &&
          enriched("o_orderpriority") === feat("entity"), "left")
      .select(
        col("o_orderkey"), col("linenumber"), col("quantity"),
        performance.as("performance"),
        col("latest_line_qty"), col("latest_line_flag"), col("last_ship_day"),
        col("n_deals_global"), col("sum_price_global"),
        col("c_name"), col("c_mktsegment").as("tier"),
        col("o_orderpriority").as("entity"), col("n_name"),
        col("scenario_count_current"), col("scenario_count_one_month"),
        col("scenario_count_two_months"),
        col("rank_in_tier_one_month"), col("rank_in_tier_two_months"))
      .dumpOrdered("o_orderkey", "linenumber", "quantity")
  }

  val oracle: String =
    """WITH deals AS (
      |  SELECT * FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |    AND o_orderdate < TIMESTAMP '1997-07-01'),
      |latest AS (
      |  SELECT l_orderkey,
      |    max_by(l_quantity,
      |      CAST(epoch(l_shipdate) AS BIGINT) * 10000000 + l_linenumber * 10000
      |        + CAST(l_quantity * 100 AS BIGINT)) AS latest_line_qty,
      |    max_by(l_returnflag,
      |      CAST(epoch(l_shipdate) AS BIGINT) * 10000000 + l_linenumber * 10000
      |        + CAST(l_quantity * 100 AS BIGINT)) AS latest_line_flag,
      |    strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship_day
      |  FROM lineitem GROUP BY l_orderkey),
      |exploded AS (
      |  SELECT d.*, COALESCE(l.l_linenumber, 0) AS linenumber,
      |         COALESCE(l.l_quantity, 0.0) AS quantity
      |  FROM deals d
      |  LEFT JOIN (SELECT * FROM lineitem WHERE l_returnflag = 'R') l
      |    ON d.o_orderkey = l.l_orderkey),
      |g_agg AS (
      |  SELECT count(DISTINCT o_orderkey) AS n_deals_global,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |           AS sum_price_global
      |  FROM deals),
      |enriched AS (
      |  SELECT e.*, c.c_name, c.c_mktsegment, c.c_nationkey AS cnk
      |  FROM exploded e LEFT JOIN customer c ON e.o_custkey = c.c_custkey),
      |enriched2 AS (
      |  SELECT e.*, n.n_name
      |  FROM enriched e LEFT JOIN nation n ON e.cnk = n.n_nationkey),
      |counts AS (
      |  SELECT c_mktsegment AS tier, o_orderpriority AS entity,
      |         strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
      |         count(*) AS cnt
      |  FROM enriched2
      |  WHERE strftime(date_trunc('month', o_orderdate), '%Y-%m')
      |        IN ('1997-06', '1997-05', '1997-04')
      |  GROUP BY 1, 2, 3),
      |r AS (SELECT *, rank() OVER (PARTITION BY tier, month ORDER BY cnt DESC)
      |        AS rnk FROM counts),
      |feat AS (
      |  SELECT tier, entity,
      |    coalesce(max(CASE WHEN month = '1997-06' THEN cnt END), 0)
      |      AS scenario_count_current,
      |    coalesce(max(CASE WHEN month = '1997-05' THEN cnt END), 0)
      |      AS scenario_count_one_month,
      |    coalesce(max(CASE WHEN month = '1997-04' THEN cnt END), 0)
      |      AS scenario_count_two_months,
      |    coalesce(max(CASE WHEN month = '1997-05' THEN rnk END), 0)
      |      AS rank_in_tier_one_month,
      |    coalesce(max(CASE WHEN month = '1997-04' THEN rnk END), 0)
      |      AS rank_in_tier_two_months
      |  FROM r GROUP BY 1, 2)
      |SELECT e.o_orderkey, e.linenumber, e.quantity,
      |  CASE WHEN e.linenumber = 0 THEN 'Deals Not Exported'
      |       WHEN e.quantity >= 45 THEN 'Export Winner Deals'
      |       WHEN e.quantity >= 25 THEN 'Failed In Scope Deals'
      |       ELSE 'Failed Out of Scope Deals' END AS performance,
      |  l.latest_line_qty, l.latest_line_flag, l.last_ship_day,
      |  g.n_deals_global, g.sum_price_global,
      |  e.c_name, e.c_mktsegment AS tier, e.o_orderpriority AS entity, e.n_name,
      |  f.scenario_count_current, f.scenario_count_one_month,
      |  f.scenario_count_two_months,
      |  f.rank_in_tier_one_month, f.rank_in_tier_two_months
      |FROM enriched2 e
      |LEFT JOIN latest l ON e.o_orderkey = l.l_orderkey
      |CROSS JOIN g_agg g
      |LEFT JOIN feat f
      |  ON e.c_mktsegment = f.tier AND e.o_orderpriority = f.entity
      |ORDER BY e.o_orderkey, e.linenumber, e.quantity""".stripMargin
}
