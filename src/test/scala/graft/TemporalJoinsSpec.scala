package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

/** [[graft.operators.TemporalJoins]] — as-of and bucketized range join.
  * Semantics on crafted frames (tie at equal ts, no-match null,
  * tolerance cutoff, range boundary exclusivity) plus the plan
  * guarantees that make them scale: no join node at all in the as-of
  * plan, and no BroadcastNestedLoopJoin in the keyless range plan. */
class TemporalJoinsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tsOf(us: Long) = {
    // keep µs precision: Timestamp(ms) alone truncates to milliseconds
    val t = new java.sql.Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private lazy val quotes = Seq(
    (1L, tsOf(1000000L), 10.0),   // user 1 @ 1s
    (1L, tsOf(3000000L), 11.0),   // user 1 @ 3s
    (2L, tsOf(2000000L), 20.0)    // user 2 @ 2s
  ).toDF("uid", "ts", "px")

  private lazy val trades = Seq(
    (1L, tsOf(500000L), 100L),    // before any quote → null
    (1L, tsOf(3000000L), 101L),   // tie with quote @ 3s → 11.0 (<= rule)
    (1L, tsOf(9000000L), 102L),   // latest quote 3s earlier → 11.0
    (2L, tsOf(2500000L), 103L),   // user 2 quote @ 2s → 20.0
    (3L, tsOf(1000000L), 104L)    // user with no quotes at all → null
  ).toDF("uid", "ts", "tid")

  test("as-of backward: tie matches, no-prior is null, keys don't leak") {
    val out = TemporalJoins.asofBackward(trades, quotes, Seq("uid"), "ts", Seq("px"))
      .orderBy("tid")
      .select("tid", "asof_px").as[(Long, Option[Double])].collect()
    assert(out.toSeq == Seq(100L -> None, 101L -> Some(11.0),
      102L -> Some(11.0), 103L -> Some(20.0), 104L -> None))
  }

  test("as-of tolerance nulls out matches older than the window") {
    // 2s tolerance: trade 102 (gap 6s) loses its match, the tie keeps its
    val out = TemporalJoins.asofBackward(trades, quotes, Seq("uid"), "ts",
        Seq("px"), toleranceUs = 2000000L)
      .orderBy("tid")
      .select("tid", "asof_px").as[(Long, Option[Double])].collect()
    assert(out.toSeq == Seq(100L -> None, 101L -> Some(11.0),
      102L -> None, 103L -> Some(20.0), 104L -> None))
  }

  test("as-of: a matched right row with a NULL payload yields null, not a stale older value") {
    // quote @ 2s has px = NULL; the 3s trade must match THAT row (null px,
    // asof_ts = 2s) — not skip back to the 1s row's 10.0
    val q = Seq((1L, tsOf(1000000L), Some(10.0)), (1L, tsOf(2000000L), None))
      .toDF("uid", "ts", "px")
    val t = Seq((1L, tsOf(3000000L), 100L)).toDF("uid", "ts", "tid")
    val row = TemporalJoins.asofBackward(t, q, Seq("uid"), "ts", Seq("px"))
      .select(col("asof_px"), unix_micros(col("asof_ts"))).collect().head
    assert(row.isNullAt(0), s"stale payload leaked: $row")
    assert(row.getLong(1) == 2000000L, s"wrong matched ts: $row")
    // and the payload/ts pair stays atomic under tolerance: the null-px
    // match at 2s is in tolerance, the 1s row must not re-enter
    val tol = TemporalJoins.asofBackward(t, q, Seq("uid"), "ts", Seq("px"),
        toleranceUs = 1500000L)
      .select(col("asof_px"), unix_micros(col("asof_ts"))).collect().head
    assert(tol.isNullAt(0) && tol.getLong(1) == 2000000L, s"tolerance tore the row: $tol")
    intercept[IllegalArgumentException](
      TemporalJoins.asofBackward(t, q, Seq("uid"), "ts", Seq("ts", "px")))
  }

  test("as-of plan has no join node (union + window, one shuffle)") {
    val plan = TemporalJoins.asofBackward(trades, quotes, Seq("uid"), "ts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("range join: boundaries are (0, delta], bucket edges don't drop pairs") {
    val left = Seq((1L, tsOf(10000000L))).toDF("lid", "ts")
    val right = Seq(
      (50L, tsOf(10000000L)),  // gap 0 → excluded (strict >)
      (51L, tsOf(10000001L)),  // gap 1 µs → included
      (52L, tsOf(12000000L)),  // gap 2 s = delta → included (inclusive)
      (53L, tsOf(12000001L)),  // gap just past delta → excluded
      (54L, tsOf(11999999L))   // next bucket, inside delta → included
    ).toDF("rid", "ts")
    val got = TemporalJoins.rangeJoin(left, right, Nil, "ts", 2000000L, Seq("rid"))
      .select("r_rid").as[Long].collect().sorted.toSeq
    assert(got == Seq(51L, 52L, 54L))
  }

  test("range join with a key joins only within the key") {
    val left = Seq((1L, 7L, tsOf(1000000L))).toDF("lid", "k", "ts")
    val right = Seq((60L, 7L, tsOf(1500000L)), (61L, 8L, tsOf(1500000L)))
      .toDF("rid", "k", "ts")
    val got = TemporalJoins.rangeJoin(left, right, Seq("k"), "ts", 1000000L, Seq("rid"))
      .select("r_rid").as[Long].collect().toSeq
    assert(got == Seq(60L))
  }

  test("sessionize: gap chains, exact-gap stays, per-key numbering, ties") {
    val ev = Seq(
      // user 1: events at 0s, 5s (gap 5 ≤ 10 → same), 15s (gap 10 =
      // gapUs → SAME session, strict >), 30s (gap 15 → new session)
      (1L, tsOf(0L), 1L), (1L, tsOf(5000000L), 2L),
      (1L, tsOf(15000000L), 3L), (1L, tsOf(30000000L), 4L),
      // user 2: two events at the SAME µs → one session of 2, then far
      (2L, tsOf(7000000L), 5L), (2L, tsOf(7000000L), 6L),
      (2L, tsOf(100000000L), 7L))
      .toDF("user_id", "ts", "event_id")
    val got = TemporalJoins.sessionize(ev, gapUs = 10000000L)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "start_us", "end_us",
        "duration_us")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 3L, 0L, 15000000L, 15000000L),
      (1L, 2L, 1L, 30000000L, 30000000L, 0L),
      (2L, 1L, 2L, 7000000L, 7000000L, 0L),
      (2L, 2L, 1L, 100000000L, 100000000L, 0L)), s"got $got")
    intercept[IllegalArgumentException](TemporalJoins.sessionize(ev, 0L))
  }

  test("keyless range plan is an equi-join on the bucket, never BNLJ") {
    val left = Seq((1L, tsOf(0L))).toDF("lid", "ts")
    val right = Seq((2L, tsOf(1L))).toDF("rid", "ts")
    val plan = TemporalJoins.rangeJoin(left, right, Nil, "ts", 1000000L, Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join"), plan)
  }
}
