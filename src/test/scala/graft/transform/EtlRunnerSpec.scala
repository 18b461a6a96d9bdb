package graft.transform

import java.time.LocalDate
import graft.SparkSpec

class EtlRunnerSpec extends SparkSpec {

  private val days = Seq(LocalDate.parse("2024-05-01"), LocalDate.parse("2024-05-02"))
  private val markets = Seq("diario", "intra")

  test("poisoned leg fails alone; retry of failed legs heals the ledger") {
    var calls = List[(String, String)]()
    val first = EtlRunner.run(days, markets) { (d, m) =>
      calls ::= (d.toString, m)
      if (d.toString == "2024-05-02" && m == "intra")
        sys.error("sheet missing for 2024-05-02")
      else 42L
    }
    assert(calls.length == 4)
    assert(first.count(_.ok) == 3 && first.count(!_.ok) == 1)
    val bad = first.find(!_.ok).get
    assert(bad.day == "2024-05-02" && bad.market == "intra")
    assert(bad.error.contains("sheet missing"))

    // ledger round-trips through a DataFrame (what lands next to the lake)
    val ldf = EtlRunner.ledger(spark, first)
    val failed = EtlRunner.failedLegs(ldf)
    assert(failed == Seq((LocalDate.parse("2024-05-02"), "intra")))

    // retry ONLY the failed legs; the source is fixed now
    val retry = EtlRunner.runLegs(failed)((_, _) => 7L)
    assert(retry.forall(_.ok))
    val merged = EtlRunner.mergeLedgers(first, retry)
    assert(merged.length == 4 && merged.forall(_.ok))
    // the healed leg carries the retry's row count, others the original
    assert(merged.find(s => s.day == "2024-05-02" && s.market == "intra")
      .get.rows == 7L)
    assert(merged.count(_.rows == 42L) == 3)
  }

  test("runLegs executes exactly the given pairs (no cross-product rebuild)") {
    // failures on (d1, intra) and (d2, diario): a days×markets rebuild
    // would run 4 legs and re-execute the 2 healthy ones (ADVICE r11);
    // runLegs touches only the failed pairs
    val failedPairs = Seq((days(0), "intra"), (days(1), "diario"))
    var ran = List[(String, String)]()
    val retry = EtlRunner.runLegs(failedPairs) { (d, m) =>
      ran ::= (d.toString, m); 1L
    }
    assert(retry.length == 2 && retry.forall(_.ok))
    assert(ran.toSet == Set(("2024-05-01", "intra"), ("2024-05-02", "diario")))
  }

  test("distributed legs: statuses reflect real Spark job results") {
    val got = EtlRunner.run(days.take(1), markets) { (_, m) =>
      val df = graft.Tables.orders(spark, sfDir)
      if (m == "intra") df.filter(org.apache.spark.sql.functions.col("nope") > 1).count()
      else df.limit(10).count()
    }
    assert(got.find(_.market == "diario").get.rows == 10L)
    val intra = got.find(_.market == "intra").get
    assert(!intra.ok && intra.error.nonEmpty) // analysis error captured
  }
}
