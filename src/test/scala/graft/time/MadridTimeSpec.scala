package graft.time

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** DST conformance — the reference's de-facto corpus: 2024-03-31
  * (spring-forward, 92 quarters), 2024-10-27 (fall-back, 100 quarters),
  * plus 2025 transitions. SURVEY.md §5 / §7.4.1.
  */
class MadridTimeSpec extends SparkSpec {
  import spark.implicits._

  test("W1 calendar marks transition days and interval counts") {
    val cal = MadridTime.calendarDim(spark, 2024, 2025)
    val byDate = cal.collect().map(r =>
      r.getDate(0).toString -> (r.getInt(1), r.getInt(2))).toMap
    assert(byDate("2024-03-31") == (2, 92))
    assert(byDate("2024-10-27") == (1, 100))
    assert(byDate("2025-03-30") == (2, 92))
    assert(byDate("2025-10-26") == (1, 100))
    assert(byDate("2024-07-15") == (0, 96))
    assert(cal.count() == 731)
  }

  test("W4 quarter-index arithmetic covers 92/96/100-interval days exactly") {
    for ((day, n) <- Seq(("2024-03-31", 92), ("2024-10-27", 100),
        ("2024-07-15", 96))) {
      val df = Seq.range(1, n + 1).toDF("idx")
        .withColumn("utc", MadridTime.utcFromQuarterIndex(lit(day), col("idx")))
      val ts = df.orderBy("idx").select("utc").as[java.sql.Timestamp].collect()
      assert(ts.length == n)
      // contiguous 15-minute grid on the UTC axis
      assert(ts.sliding(2).forall(p => p(1).getTime - p(0).getTime == 15 * 60 * 1000))
      // local midnight: CET in winter (UTC+1) / CEST in summer (UTC+2)
      val firstUtcHour = ts.head.toInstant.atZone(java.time.ZoneOffset.UTC).getHour
      if (day == "2024-07-15") assert(firstUtcHour == 22) // prev-day 22:00 UTC
      else assert(firstUtcHour == 23 || firstUtcHour == 22)
    }
  }

  test("W4 spring-forward day ends at next local midnight (23h day)") {
    val last = Seq(92).toDF("idx")
      .select(MadridTime.utcFromQuarterIndex(lit("2024-03-31"), col("idx")))
      .as[java.sql.Timestamp].head()
    // next local midnight is 2024-03-31T22:00Z; last quarter starts 15 min before
    assert(last.toInstant.toString == "2024-03-31T21:45:00Z")
  }

  test("decade sweep: every day 2020-2030, every quarter index matches java.time") {
    val zone = java.time.ZoneId.of(MadridTime.Zone)
    val cal = MadridTime.calendarDim(spark, 2020, 2030)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getInt(2)))
    // driver-side expected instants straight from java.time (test oracle)
    val expected = cal.flatMap { case (day, quarters) =>
      val midnight = day.atStartOfDay(zone).toInstant
      (1 to quarters).map { i =>
        (day.toString, i,
          java.sql.Timestamp.from(midnight.plusSeconds((i - 1) * 900L)))
      }
    }.toSeq.toDF("fecha", "idx", "expected")
    val kernel = MadridTime.calendarDim(spark, 2020, 2030)
      .withColumn("idx", explode(sequence(lit(1), col("quarters_in_day"))))
      .select(col("fecha").cast("string").as("fecha"), col("idx"),
        MadridTime.utcFromQuarterIndex(col("fecha"), col("idx")).as("utc"))
    val joined = kernel.join(expected, Seq("fecha", "idx"))
    val total = joined.count()
    assert(total == expected.count()) // every (day, idx) produced
    assert(total > 380000L)           // ~11 years × ~96 quarters
    assert(joined.filter(col("utc") =!= col("expected")).count() == 0)
  }

  test("W3 hourly labels with a/b suffix on the fall-back day") {
    val cal = MadridTime.calendarDim(spark, 2024, 2024)
    val rows = Seq(
      ("2024-10-27", "00-01"), ("2024-10-27", "01-02"),
      ("2024-10-27", "02-03a"), ("2024-10-27", "02-03b"),
      ("2024-10-27", "03-04"), ("2024-07-15", "02-03"),
      ("2024-03-31", "01-02"), ("2024-03-31", "03-04"))
      .toDF("fecha", "label")
    val out = rows.join(broadcast(cal), Seq("fecha"))
      .withColumn("utc", MadridTime.utcFromHourLabel(
        col("fecha"), col("label"), col("transition_type")))
      .select("fecha", "label", "utc").as[(String, String, java.sql.Timestamp)]
      .collect().map(r => (r._1, r._2) -> r._3.toInstant.toString).toMap
    // fall-back: local 00,01 are CEST (UTC+2); 02a CEST, 02b CET; 03 CET
    assert(out(("2024-10-27", "00-01")) == "2024-10-26T22:00:00Z")
    assert(out(("2024-10-27", "01-02")) == "2024-10-26T23:00:00Z")
    assert(out(("2024-10-27", "02-03a")) == "2024-10-27T00:00:00Z")
    assert(out(("2024-10-27", "02-03b")) == "2024-10-27T01:00:00Z")
    assert(out(("2024-10-27", "03-04")) == "2024-10-27T02:00:00Z")
    // normal summer day: UTC+2
    assert(out(("2024-07-15", "02-03")) == "2024-07-15T00:00:00Z")
    // spring-forward: 01 is CET (UTC+1); 03 is CEST — and hour 2 is absent
    assert(out(("2024-03-31", "01-02")) == "2024-03-31T00:00:00Z")
    assert(out(("2024-03-31", "03-04")) == "2024-03-31T01:00:00Z")
  }

  test("W6 OMIE 1-based hour index spans 23/24/25-hour days") {
    def utcOf(day: String, h: Int) = Seq(h).toDF("h")
      .select(MadridTime.utcFromHourIndex(lit(day), col("h")))
      .as[java.sql.Timestamp].head().toInstant.toString
    assert(utcOf("2024-07-15", 1) == "2024-07-14T22:00:00Z")
    assert(utcOf("2024-10-27", 25) == "2024-10-27T22:00:00Z") // 25th hour exists
    // 23-hour day: index 23 = local 23:00 CEST = 21:00Z (hour 2 was skipped)
    assert(utcOf("2024-03-31", 23) == "2024-03-31T21:00:00Z")
  }

  test("W7 H2Q4 label → quarter index") {
    val out = Seq("H1Q1", "H2Q4", "H24Q4").toDF("l")
      .select(MadridTime.quarterIndexFromH2Q4(col("l"))).as[Int].collect()
    assert(out.sameElements(Array(1, 8, 96)))
  }

  test("W8 MIC contract parse") {
    val r = Seq("20241027-05XX").toDF("c").select(
      MadridTime.micDeliveryDate(col("c")).cast("string"),
      MadridTime.micDeliveryHour(col("c"))).as[(String, Int)].head()
    assert(r == ("2024-10-27", 5))
  }

  test("W5/A2 upsample then downsample round-trips the hourly mean") {
    val hourly = Seq(("2024-07-15 10:00:00", 8.0), ("2024-07-15 11:00:00", 4.0))
      .toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val up = MadridTime.upsampleHourly(hourly, "ts", "v", divideValue = true)
    assert(up.count() == 8)
    assert(up.agg(sum("v")).as[Double].head() == 12.0) // energy preserved
    val down = MadridTime.downsampleToHour(up, "ts", Nil, Seq("v"), Nil)
    val back = down.orderBy("ts").select("v").as[Double].collect()
    assert(back.sameElements(Array(2.0, 1.0))) // mean of quarters = v/4
  }
}
