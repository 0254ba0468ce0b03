package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Temporal

class TemporalSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  test("asofBackward: latest prior right row per key, inclusive at equal ts, " +
      "null when no prior, deterministic on right-ts ties") {
    val left = Seq(
      (1L, 10L, 100L), // u1 @100 → right @90 (id 12, latest ≤ 100)
      (2L, 10L, 90L),  // u1 @90  → right @90 (inclusive)
      (3L, 10L, 40L),  // u1 @40  → no right ≤ 40 → null
      (4L, 20L, 500L), // u2 @500 → tie at ts 70: id 23 wins (max tiebreak)
      (5L, 30L, 10L)   // u3: key has no right rows at all → null
    ).toDF("p_id", "user_id", "p_us")
    val right = Seq(
      (10L, 50L, 11L), (10L, 90L, 12L),
      (20L, 70L, 22L), (20L, 70L, 23L)
    ).toDF("user_id", "ts_us", "event_id")

    val out = Temporal
      .asofBackward(left, right, Seq("user_id"), "p_us", "ts_us", Seq("event_id"))
      .select(col("p_id"), col("asof.ts_us").as("v_us"), col("asof.event_id").as("v_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out === Set(
      (1L, 90L, 12L), (2L, 90L, 12L), (3L, -1L, -1L),
      (4L, 70L, 23L), (5L, -1L, -1L)))
  }

  test("asofForward: earliest later right row per key, inclusive at equal ts, " +
      "null when none follows, MIN tiebreak on right-ts ties") {
    val left = Seq(
      (1L, 10L, 60L),  // u1 @60  → right @90 (earliest ≥ 60)
      (2L, 10L, 90L),  // u1 @90  → right @90 (inclusive)
      (3L, 10L, 95L),  // u1 @95  → nothing later → null
      (4L, 20L, 50L),  // u2 @50  → tie at ts 70: id 22 wins (min tiebreak)
      (5L, 30L, 10L)   // u3: key has no right rows at all → null
    ).toDF("p_id", "user_id", "p_us")
    val right = Seq(
      (10L, 50L, 11L), (10L, 90L, 12L),
      (20L, 70L, 22L), (20L, 70L, 23L)
    ).toDF("user_id", "ts_us", "event_id")

    val out = Temporal
      .asofForward(left, right, Seq("user_id"), "p_us", "ts_us", Seq("event_id"))
      .select(col("p_id"), col("asof.ts_us").as("v_us"), col("asof.event_id").as("v_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out === Set(
      (1L, 90L, 12L), (2L, 90L, 12L), (3L, -1L, -1L),
      (4L, 70L, 22L), (5L, -1L, -1L)))
  }

  test("asofBackward: TimestampType keeps sub-second order (no whole-second truncation)") {
    // right row at 10:00:00.500 is AFTER left row at 10:00:00.200 —
    // with cast("long") both truncate to the same second and the right
    // row (side 0) would wrongly sort first and get attached
    val left = Seq((1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.2")))
      .toDF("p_id", "k", "lts")
    val right = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.5"), 99L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 09:59:59.9"), 7L)
    ).toDF("k", "rts", "event_id")
    val out = Temporal
      .asofBackward(left, right, Seq("k"), "lts", "rts", Seq("event_id"))
      .select(col("asof.event_id")).head()
    assert(out.getLong(0) == 7L) // the 09:59:59.9 row, not the later .5 one
  }

  test("nearestJoin: argmin |Δt| within key, earlier point on equidistant tie, " +
      "keyless left rows drop, duplicate left rows fold to one") {
    val comments = Seq(
      ("a", 100L), ("a", 100L), // duplicate annotation folds to ONE row
      ("a", 25L),               // equidistant between 20 and 30 → 20 wins
      ("b", 1000L),             // nearest is BEFORE (backward match)
      ("c", 5L)                 // series with no datapoints → drops
    ).toDF("dataset_id", "date_us")
    val data = Seq(
      ("a", 20L, 2.0), ("a", 30L, 3.0), ("a", 98L, 9.0), ("a", 105L, 1.5),
      ("b", 900L, 7.0), ("b", 2000L, 8.0)
    ).toDF("dataset_id", "ts_us", "value")

    val out = Temporal
      .nearestJoin(comments, data, Seq("dataset_id"),
        "date_us", "ts_us", Seq("value"))
      .select(col("dataset_id"), col("date_us"),
        col("nearest.diff_us"), col("nearest.ts_us"), col("nearest.value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq.sorted
    assert(out == Seq(
      ("a", 25L, 5L, 20L, 2.0),    // tie 20 vs 30 → earlier ts
      ("a", 100L, 2L, 98L, 9.0),   // 98 (Δ2) beats 105 (Δ5)
      ("b", 1000L, 100L, 900L, 7.0)), s"got $out")

    // plan shape: the annotation side must broadcast — a data-side
    // shuffle would sort the corpus against a ≤20-row comment table
    val plan = Temporal.nearestJoin(comments, data, Seq("dataset_id"),
      "date_us", "ts_us", Seq("value")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"left side not broadcast:\n$plan")
  }

  test("slidingAgg: every point lands in exactly size/slide epoch-aligned windows") {
    // one point at t=100s: windows starting 45,60,75,90 (size 60, slide 15)
    val one = TestSpark.longDF(Seq(("a", "1970-01-01T00:01:40", 2.0)))
    val wins = Temporal.slidingAgg(one, 60, 15)
      .select("win_s", "cnt").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wins === Set((45L, 1L), (60L, 1L), (75L, 1L), (90L, 1L)))

    // two points 20s apart aggregate in their shared windows
    val two = TestSpark.longDF(Seq(
      ("a", "1970-01-01T00:01:40", 2.0), ("a", "1970-01-01T00:02:00", 5.0)))
    val byWin = Temporal.slidingAgg(two, 60, 15)
      .collect().map(r => r.getLong(1) -> (r.getLong(5), r.getDouble(4))).toMap
    assert(byWin(90L) === ((2L, 7.0)))  // covers 90..150: both
    assert(byWin(45L) === ((1L, 2.0)))  // covers 45..105: first only
    assert(byWin(105L) === ((1L, 5.0))) // covers 105..165: second only
  }

  test("toleranceJoin: exactly the pairs within ±tol, once each, across " +
      "bucket boundaries") {
    // tol = 10 → bucket width 20; pairs straddling bucket edges must
    // match exactly once (the explode covers both candidate buckets)
    val left = Seq((1L, 100L), (2L, 119L), (3L, 200L)).toDF("l_id", "l_ts")
    val right = Seq((10L, 91L), (11L, 109L), (12L, 121L), (13L, 140L))
      .toDF("r_id", "r_ts")
    val got = Temporal.toleranceJoin(left, right, "l_ts", "r_ts", 10L)
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    // l=100 matches 91,109 (not 121: |Δ|=21); l=119 matches 109 (|Δ|=10,
    // inclusive), 121; l=200 matches nothing
    assert(got.sorted === List((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L)))
    assert(got.size === got.distinct.size, "each pair matches exactly once")
  }

  test("toleranceJoin equals the brute-force cross-join filter on random data") {
    for (seed <- Seq(7, 23, 99)) {
      val rnd = new scala.util.Random(seed)
      val l = Seq.tabulate(60)(i => (i.toLong, rnd.nextInt(2000).toLong))
        .toDF("l_id", "l_ts")
      val r = Seq.tabulate(60)(i => (1000L + i, rnd.nextInt(2000).toLong))
        .toDF("r_id", "r_ts")
      val tol = 25L + rnd.nextInt(100)
      val got = Temporal.toleranceJoin(l, r, "l_ts", "r_ts", tol)
        .select("l_id", "r_id")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      val want = l.crossJoin(r)
        .where(abs(col("l_ts") - col("r_ts")) <= tol)
        .select("l_id", "r_id")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      assert(got.sorted === want.sorted, s"seed=$seed tol=$tol")
      assert(got.size === got.distinct.size, s"dup pairs at seed=$seed")
    }
  }

  test("topKPerKey: rank by value desc with unique tiebreaker") {
    val df = Seq(
      (1L, 100L, 5.0), (1L, 101L, 9.0), (1L, 102L, 9.0), (1L, 103L, 1.0),
      (2L, 200L, 3.0)
    ).toDF("user_id", "event_id", "value")
    val out = Temporal.topKPerKey(
        df, Seq("user_id"), Seq(col("value").desc, col("event_id")), 2)
      .select("user_id", "event_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // value tie 9.0 broken by event_id asc: 101 before 102; 5.0 is cut at k=2
    assert(out === Set((1L, 101L, 1), (1L, 102L, 2), (2L, 200L, 1)))
  }
}
