package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Property check for [[EventStreams.userSessions]]: on random dense
  * (user, time) grids — duplicate timestamps, exact-gap boundaries, and
  * multi-user interleavings all occur — the `session_window` aggregation
  * must equal an in-memory reference that merges a user's sorted event
  * times with the closed-interval rule (diff <= gap stays in the
  * session). */
object SessionProps extends Properties("UserSessions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val GapUs = 1800000000L // 30 minutes, the operator default

  // Times quantized to multiples of gap/2 so exact-boundary (diff == gap)
  // cases appear with high probability alongside merges and splits.
  private val eventsGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(14, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 8L)))

  private def reference(evs: List[(Long, Long)]): Set[(Long, Long, Long, Long)] =
    evs.groupBy(_._1).flatMap { case (user, rows) =>
      val times = rows.map(_._2).sorted
      times.tail.foldLeft(List((times.head, times.head, 1L))) {
        case ((s, e, n) :: acc, t) =>
          if (t - e <= GapUs) (s, t, n + 1) :: acc
          else (t, t, 1L) :: (s, e, n) :: acc
        case (Nil, _) => Nil // unreachable: seed is non-empty
      }.map { case (s, e, n) => (user, s, e, n) }
    }.toSet

  property("session_window equals the in-memory closed-interval merge") =
    forAll(eventsGen) { raw =>
      val evs = raw.map { case (u, slot) => (u, slot * (GapUs / 2)) }
      val df = evs.zipWithIndex
        .map { case ((u, us), i) => (i.toLong, us * 1000, u, "view", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
      val got = EventStreams.userSessions(df)
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      val expected = reference(evs)
      Prop(got == expected) :| s"got=$got expected=$expected"
    }
}
