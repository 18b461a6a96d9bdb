package graft.plans

import java.sql.Timestamp
import graft.SparkSpec
import graft.operators.AsOfJoin

class AsOfPlanSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixtures = {
    val facts = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:20:00")),
      (3L, 20L, ts("2024-01-01 10:05:00")),
      (4L, 30L, ts("2024-01-01 09:00:00"))) // no prior quote → nulls
      .toDF("event_id", "k", "ts")
    val quotes = Seq(
      (10L, ts("2024-01-01 09:55:00"), 1.5),
      (10L, ts("2024-01-01 10:10:00"), 2.5),
      (20L, ts("2024-01-01 10:05:00"), 7.0), // equal ts applies (<=)
      (30L, ts("2024-01-01 12:00:00"), 9.0))
      .toDF("k", "ts", "price")
    (facts, quotes)
  }

  test("AsOfJoinPlan lowers during analysis to the composed operator") {
    val (facts, quotes) = fixtures
    val viaPlan = AsOfJoinPlan.build(facts, quotes, "k", "ts", Seq("price"))
    // the custom node never reaches the optimizer
    assert(!viaPlan.queryExecution.analyzed.collect {
      case p: AsOfJoinPlan => p
    }.exists(_ => true), "node survived analysis")
    val expected = AsOfJoin.asOf(facts, quotes, "k", "ts", Seq("price"))
      .select("event_id", "price").as[(Long, Option[Double])].collect().toMap
    val got = viaPlan.select("event_id", "price")
      .as[(Long, Option[Double])].collect().toMap
    assert(got == expected)
    assert(got(1L).contains(1.5) && got(2L).contains(2.5) &&
      got(3L).contains(7.0) && got(4L).isEmpty)
    // schema contract: the node's declared nullable payload holds
    assert(viaPlan.schema("price").nullable)
    // physical shape of the lowering: the one-exchange window composition
    val p = viaPlan.queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"lowering lost the fill window:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange ")) <= 2,
      s"as-of lowering pays unexpected exchanges:\n$p")
  }

  test("missing payload column fails fast at build") {
    val (facts, quotes) = fixtures
    intercept[IllegalArgumentException] {
      AsOfJoinPlan.build(facts, quotes, "k", "ts", Seq("nope"))
    }
  }
}
