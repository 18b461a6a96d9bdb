package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketed range join equals the naive non-equi join, without BNLJ") {
    val intervals = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:45:00")),
      (101L, 1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:15:00")), // overlaps 100
      (102L, 2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:45:00")))
      .toDF("iv_id", "user_id", "start_ts", "end_ts")
    val facts = Seq(
      (1L, 1L, ts("2024-01-01 10:15:00")), // in 100 only
      (2L, 1L, ts("2024-01-01 10:40:00")), // in 100 AND 101
      (3L, 1L, ts("2024-01-01 11:00:00")), // in 101 only
      (4L, 1L, ts("2024-01-01 12:00:00")), // in none
      (5L, 2L, ts("2024-01-01 10:40:00")), // in 102 (key isolation)
      (6L, 2L, ts("2024-01-01 10:45:00"))) // inclusive end boundary
      .toDF("event_id", "user_id", "ts")
    val got = RangeJoin.byContainment(facts, intervals,
        "user_id", "ts", "start_ts", "end_ts", bucketSeconds = 600)
      .select("iv_id", "event_id").as[(Long, Long)].collect().toSet
    val naive = facts.as("f").join(intervals.as("i"),
        $"f.user_id" === $"i.user_id" &&
          $"f.ts" >= $"i.start_ts" && $"f.ts" <= $"i.end_ts")
      .select($"i.iv_id", $"f.event_id").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((100L, 1L), (100L, 2L), (101L, 2L), (101L, 3L),
      (102L, 5L), (102L, 6L)))
    // each matching (interval, fact) pair appears exactly once despite the
    // interval spanning several buckets
    val all = RangeJoin.byContainment(facts, intervals,
      "user_id", "ts", "start_ts", "end_ts", bucketSeconds = 60)
    assert(all.count() == all.distinct().count())
  }

  test("inverted intervals fail loudly, not as a silent garbage explode") {
    val intervals = Seq(
      (200L, 1L, ts("2024-01-01 11:00:00"), ts("2024-01-01 10:00:00"))) // end < start
      .toDF("iv_id", "user_id", "start_ts", "end_ts")
    val facts = Seq((1L, 1L, ts("2024-01-01 10:30:00")))
      .toDF("event_id", "user_id", "ts")
    val e = intercept[Exception] {
      RangeJoin.byContainment(facts, intervals,
        "user_id", "ts", "start_ts", "end_ts", bucketSeconds = 600).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("inverted interval")))
  }

  test("NULL interval bounds drop the row (old semantics), never raise") {
    val intervals = Seq(
      (400L, 1L, Some(ts("2024-01-01 10:00:00")), None: Option[java.sql.Timestamp]),
      (401L, 1L, None: Option[java.sql.Timestamp], Some(ts("2024-01-01 11:00:00"))),
      (402L, 1L, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 11:00:00"))))
      .toDF("iv_id", "user_id", "start_ts", "end_ts")
    val facts = Seq((1L, 1L, ts("2024-01-01 10:30:00")))
      .toDF("event_id", "user_id", "ts")
    // a NULL bound can never satisfy ts>=start && ts<=end, so the row
    // contributes nothing — it must NOT trip the inverted-interval raise
    // (when() evaluates NULL → otherwise() → raise_error without the guard)
    val got = RangeJoin.byContainment(facts, intervals,
      "user_id", "ts", "start_ts", "end_ts", bucketSeconds = 600)
      .select("iv_id", "event_id").as[(Long, Long)].collect().toSet
    assert(got == Set((402L, 1L)))
  }

  test("pathologically long intervals hit the bucket cap instead of sequence()'s limit") {
    val intervals = Seq( // ~3 years at 1-second buckets ≈ 10^8 buckets
      (300L, 1L, ts("2024-01-01 00:00:00"), ts("2027-01-01 00:00:00")))
      .toDF("iv_id", "user_id", "start_ts", "end_ts")
    val facts = Seq((1L, 1L, ts("2024-06-01 10:30:00")))
      .toDF("event_id", "user_id", "ts")
    val e = intercept[Exception] {
      RangeJoin.byContainment(facts, intervals,
        "user_id", "ts", "start_ts", "end_ts", bucketSeconds = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("buckets")))
  }
}
