package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Bucketed joins must plan without a shuffle (no Exchange above the
  * bucketed scans) and return the same rows as the plain join. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("same-bucketed tables join with zero Exchange in the plan") {
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    val o = Tables.orders(spark, TestSpark.sf)
    val li = Tables.lineitem(spark, TestSpark.sf)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(o, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(li, "lineitem_b", "o_orderkey", 8)

    // Disable auto-broadcast so the planner must pick a sort-merge join —
    // the case bucketing exists for (two BIG sides at scale).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")

      val expected = o.join(li, Seq("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
