package graft

import graft.Out.OrderedOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** The reference's JSON-array-of-strings semantics (SURVEY.md §2.7 F3–F8 +
  * §2.2 P3–P5): the `results` column is a JSON array TEXT, cast to an array
  * of JSON values, lambda-filtered by `json_extract_string`, indexed
  * 1-based, with string-comparison semantics for booleans ('true'/'false')
  * and the literal text 'null' (exports_results.sql:36-42,86-93,117-134).
  *
  * Here the array is built deterministically from `lineitem` (sorted by
  * line number) so both engines construct identical logical arrays; only
  * extracted values are compared, never raw JSON text.
  */
object JsonQueries {

  /** Per-order JSON array of line-item objects, element order pinned by
    * l_linenumber (unique within an order). */
  private def resultsArray(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(transform(
        array_sort(collect_list(struct(col("l_linenumber"), col("l_quantity"),
          col("l_returnflag")))),
        x => to_json(x)).as("results"))

  /** F3/F4/F5/F8 + P3: lambda filter over JSON strings, 1-based first
    * element, NULL-safe extraction. */
  private def f3Lambda(spark: SparkSession, dir: String): DataFrame = {
    val arr = resultsArray(spark, dir)
    val o = Tables.orders(spark, dir)
    val matched = filter(col("results"), j =>
      get_json_object(j, "$.l_returnflag") === "R" &&
        get_json_object(j, "$.l_quantity").try_cast("double") > 30)
    val hit = try_element_at(matched, lit(1))
    o.join(arr, o("o_orderkey") === arr("l_orderkey"), "left")
      .select(col("o_orderkey"),
        get_json_object(hit, "$.l_linenumber").try_cast("int").as("first_r_linenumber"),
        get_json_object(hit, "$.l_quantity").try_cast("double").as("first_r_qty"))
      .dumpOrdered("o_orderkey")
  }

  /** P4+P5 (exports_results.sql:86-105): the failing-export rule with the
    * reference's string-comparison semantics ('false', literal 'null'),
    * then the keep-only-passing filter. */
  private def p4FailingRule(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(spark, dir)
      .withColumn("svc", when(col("l_discount") > 0.05, "true").otherwise("false"))
      .withColumn("cap",
        when(col("l_tax") > 0.04, "null").otherwise(col("l_quantity").cast("string")))
      .groupBy(col("l_orderkey"))
      .agg(transform(
        array_sort(collect_list(struct(col("l_linenumber"), col("svc"), col("cap")))),
        x => to_json(x)).as("results"))
    val o = Tables.orders(spark, dir)
    val first = try_element_at(col("results"), lit(1))
    val svc = get_json_object(first, "$.svc")
    val cap = get_json_object(first, "$.cap")
    val failing =
      when(first.isNull, true)
        .when(svc === "false", true)
        .when(cap.isNull || cap === "null", true)
        .otherwise(false)
    o.join(items, o("o_orderkey") === items("l_orderkey"), "left")
      .withColumn("failing_export", failing)
      .where(!col("failing_export"))
      .select(col("o_orderkey"), svc.as("svc"), cap.as("cap"))
      .dumpOrdered("o_orderkey")
  }

  /** F7+O5 (exports_results.sql:117-134): explode the filtered JSON array
    * with a `json_object`-built stub element when nothing matches. */
  private def f7ExplodeJsonDefault(spark: SparkSession, dir: String): DataFrame = {
    val arr = resultsArray(spark, dir)
    val o = Tables.orders(spark, dir)
    val matchedR = filter(col("results"), j => get_json_object(j, "$.l_returnflag") === "R")
    val stub = to_json(struct(lit(0).as("l_linenumber")))
    o.join(arr, o("o_orderkey") === arr("l_orderkey"), "left")
      .select(col("o_orderkey"),
        ExplodeDefault.explodeWithDefault(matchedR, stub).as("j"))
      .select(col("o_orderkey"),
        get_json_object(col("j"), "$.l_linenumber").try_cast("int").as("linenumber"))
      .dumpOrdered("o_orderkey", "linenumber")
  }

  val defs: Seq[(String, Q)] = Seq(
    "ref_f3_json_array_lambda" -> Q(f3Lambda, Some(
      """WITH arr AS (
        |  SELECT l_orderkey,
        |    list(json_object('l_linenumber', l_linenumber,
        |                     'l_quantity', l_quantity,
        |                     'l_returnflag', l_returnflag)
        |         ORDER BY l_linenumber, l_quantity, l_returnflag) AS results
        |  FROM lineitem GROUP BY l_orderkey),
        |hit AS (
        |  SELECT l_orderkey,
        |    list_filter(results, j ->
        |      json_extract_string(j, '$.l_returnflag') = 'R' AND
        |      TRY_CAST(json_extract_string(j, '$.l_quantity') AS DOUBLE) > 30)[1]
        |      AS h
        |  FROM arr)
        |SELECT o.o_orderkey,
        |  TRY_CAST(json_extract_string(h.h, '$.l_linenumber') AS INTEGER)
        |    AS first_r_linenumber,
        |  TRY_CAST(json_extract_string(h.h, '$.l_quantity') AS DOUBLE)
        |    AS first_r_qty
        |FROM orders o LEFT JOIN hit h ON o.o_orderkey = h.l_orderkey
        |ORDER BY o_orderkey""".stripMargin)),

    "ref_p4_failing_rule" -> Q(p4FailingRule, Some(
      """WITH lx AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_discount > 0.05 THEN 'true' ELSE 'false' END AS svc,
        |    CASE WHEN l_tax > 0.04 THEN 'null'
        |         ELSE CAST(l_quantity AS VARCHAR) END AS cap
        |  FROM lineitem),
        |arr AS (
        |  SELECT l_orderkey,
        |    list(json_object('l_linenumber', l_linenumber, 'svc', svc, 'cap', cap)
        |      ORDER BY l_linenumber, svc, cap) AS results
        |  FROM lx GROUP BY l_orderkey),
        |j AS (
        |  SELECT o.o_orderkey,
        |    json_extract_string(a.results[1], '$.svc') AS svc,
        |    json_extract_string(a.results[1], '$.cap') AS cap,
        |    CASE WHEN a.results[1] IS NULL THEN true
        |         WHEN json_extract_string(a.results[1], '$.svc') = 'false' THEN true
        |         WHEN json_extract_string(a.results[1], '$.cap') IS NULL
        |              OR json_extract_string(a.results[1], '$.cap') = 'null' THEN true
        |         ELSE false END AS failing_export
        |  FROM orders o LEFT JOIN arr a ON o.o_orderkey = a.l_orderkey)
        |SELECT o_orderkey, svc, cap FROM j
        |WHERE NOT failing_export ORDER BY o_orderkey""".stripMargin)),

    "ref_f7_explode_json_default" -> Q(f7ExplodeJsonDefault, Some(
      """WITH arr AS (
        |  SELECT l_orderkey,
        |    list_filter(
        |      list(json_object('l_linenumber', l_linenumber,
        |                       'l_quantity', l_quantity,
        |                       'l_returnflag', l_returnflag)
        |           ORDER BY l_linenumber, l_quantity, l_returnflag),
        |      j -> json_extract_string(j, '$.l_returnflag') = 'R') AS matched
        |  FROM lineitem GROUP BY l_orderkey),
        |e AS (
        |  SELECT o.o_orderkey,
        |    unnest(CASE WHEN a.matched IS NOT NULL AND len(a.matched) > 0
        |                THEN a.matched
        |                ELSE [json_object('l_linenumber', 0)] END) AS j
        |  FROM orders o LEFT JOIN arr a ON o.o_orderkey = a.l_orderkey)
        |SELECT o_orderkey,
        |  TRY_CAST(json_extract_string(j, '$.l_linenumber') AS INTEGER)
        |    AS linenumber
        |FROM e ORDER BY o_orderkey, linenumber""".stripMargin)),
  )
}
