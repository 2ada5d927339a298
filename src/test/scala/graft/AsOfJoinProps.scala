package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Property check for [[AsOfJoin.backward]]: on random small key/time
  * grids (dense enough to force equal-time collisions, matchless keys,
  * and multi-key groups), the distributed union+window rewrite must equal
  * the in-memory reference semantics — latest right row with
  * `rt <= lt` per key, NULL when none exists. */
object AsOfJoinProps extends Properties("AsOfJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Tiny domains on purpose: keys in {1..3}, times in {0..6} — collisions
  // and boundary (rt == lt) cases occur in nearly every sample.
  private val rightGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(6, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 6L)))
  private val leftGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(8, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 6L)))

  property("union+window as-of equals the in-memory reference") =
    forAll(leftGen, rightGen) { (ls, rs) =>
      // Dedup right per (key, time) like real callers (determinism contract):
      // payload is the max tag among collided rows.
      val rdd = rs.zipWithIndex.map { case ((k, t), i) => (k, t, s"p$i") }
        .groupBy { case (k, t, _) => (k, t) }
        .map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toList
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "lt", "lid")
      val right = rdd.toDF("k", "rt", "pay")

      val got = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("pay"))
        .select($"lid", $"asof_rt", $"asof_pay")
        .as[(Long, Option[Long], Option[String])]
        .collect().sortBy(_._1).toList

      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val best = rdd.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption
        (i.toLong, best.map(_._2), best.map(_._3))
      }.sortBy(_._1)

      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("forward with tolerance equals the in-memory reference") =
    forAll(leftGen, rightGen) { (ls, rs) =>
      val tol = 2L
      val rdd = rs.zipWithIndex.map { case ((k, t), i) => (k, t, s"p$i") }
        .groupBy { case (k, t, _) => (k, t) }
        .map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toList
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "lt", "lid")
      val right = rdd.toDF("k", "rt", "pay")

      val got = AsOfJoin.forward(left, right, Seq("k"), "lt", "rt", Seq("pay"),
          tolerance = Some((lt, rt) => rt - lt <= tol))
        .select($"lid", $"asof_rt", $"asof_pay")
        .as[(Long, Option[Long], Option[String])]
        .collect().sortBy(_._1).toList

      // Reference: the NEAREST following right row; if it fails the
      // tolerance the row is unmatched (no farther row is considered).
      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val best = rdd.filter(r => r._1 == k && r._2 >= t)
          .sortBy(r => (r._2, r._3)).headOption
          .filter(r => r._2 - t <= tol)
        (i.toLong, best.map(_._2), best.map(_._3))
      }.sortBy(_._1)

      Prop(got == expected) :| s"got=$got expected=$expected"
    }
}
