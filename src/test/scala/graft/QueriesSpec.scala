package graft

import org.apache.spark.sql.functions._

/** Smoke + plan-quality gate over every registered query at sf0.001.
  * Value-level correctness is the DuckDB oracle (tools/check.py / driver);
  * this suite catches runtime regressions and plan-quality regressions
  * (collect-free, pushdown present) in `sbt test`.
  */
class QueriesSpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      // a9 (anti-join diff) may legitimately be small but not negative;
      // everything else should produce rows on the fixture data
      assert(n >= 0)
      if (name != "llm_minhash_dedup") assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("s11_pruned_scan pushes filters to the parquet scan") {
    val df = SparkEntry.queries("s11_pruned_scan")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThan") || plan.contains("IsNotNull")),
      s"no pushdown in plan:\n$plan")
  }

  test("j8_dim_join broadcasts the small side") {
    val df = SparkEntry.queries("j8_dim_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }
}
