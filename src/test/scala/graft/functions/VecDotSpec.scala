package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches the higher-order-function fold bit-for-bit") {
    val df = Seq((Array(1.5, 2.0, -3.25), Array(0.5, 4.0, 2.0)))
      .toDF("a", "b")
    val r = df.select(
      expr("vec_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
        .as("hof")).as[(Double, Double)].head()
    assert(r._1 == r._2 && r._1 == 1.5 * 0.5 + 2.0 * 4.0 + (-3.25) * 2.0)
  }

  test("vec_dot on the real embeddings table inside codegen") {
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val native = e.select(expr("vec_dot(v, v)").as("d")).agg(sum("d"))
      .as[Double].head()
    val hof = e.select(
      expr("aggregate(v, 0D, (acc, x) -> acc + x * x)").as("d"))
      .agg(sum("d")).as[Double].head()
    assert(native == hof)
    // confirm the expression participates in whole-stage codegen: the
    // compact plan form marks codegen'd stages with a "*(n)" prefix
    val plan = e.select(expr("vec_dot(v, v)")).queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("vecdot") && l.trim.startsWith("*(")), plan)
  }

  test("vec_dot null propagation and length mismatch") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0))),
      (None, Some(Array(1.0)))).toDF("a", "b")
    val r = df.select(expr("vec_dot(a, b)")).as[Option[Double]].collect()
    assert(r(0).contains(3.0)) // min-length semantics
    assert(r(1).isEmpty)       // null in → null out
  }

  test("vec_dot null ELEMENT poisons the result like the HoF fold") {
    val df = Seq(
      (Array[java.lang.Double](1.0, null, 2.0), Array[java.lang.Double](1.0, 1.0, 1.0)),
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
    val r = df.select(expr("vec_dot(a, b)")).as[Option[Double]].collect()
    assert(r(0).isEmpty)        // null element ⇒ NULL (HoF: acc + null)
    assert(r(1).contains(11.0)) // nullable-typed but null-free: normal value
  }
}
