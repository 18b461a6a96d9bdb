package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** md5_prefix60 must be bit-identical to the composed hex-string form it
  * replaces (and therefore to the DuckDB oracle's mapping), including on
  * empty and non-ASCII inputs, and must run inside whole-stage codegen.
  */
class Md5Prefix60Spec extends SparkSpec {
  import spark.implicits._

  private val composed =
    "CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)"

  test("native prefix equals the composed conv(substr(md5)) on the corpus") {
    val docs = Tables.documents(spark, sfDir)
      .select($"text".as("s"))
      .union(Seq("", "a", "España 2024", "\u00e9\u4e2d\u6587",
        "the quick brown fox").toDF("s"))
    val mism = docs
      .select(expr("md5_prefix60(s)").as("native"), expr(composed).as("ref"))
      .filter($"native" =!= $"ref" || $"native".isNull =!= $"ref".isNull)
      .count()
    assert(mism == 0, s"$mism mismatching hashes")
  }

  test("null propagates and codegen participates") {
    val df = Seq(Some("x"), None).toDF("s")
      .select(expr("md5_prefix60(s)").as("h"))
    assert(df.collect().map(r => Option(r.get(0))).count(_.isEmpty) == 1)
    // a local relation constant-folds to LocalTableScan; assert codegen on
    // a real scan instead
    val plan = Tables.documents(spark, sfDir)
      .select(expr("md5_prefix60(text)").as("h"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the plan rendering
    assert(plan.contains("*(1) Project [md5prefix60"),
      s"not codegen'd:\n$plan")
  }
}
