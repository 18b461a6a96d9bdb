package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the bounded top-k aggregate (topk_structs): direction
  * flags per field, tie resolution through later fields, k larger than the
  * group, string ordering, null field ordering, and partial/merge
  * correctness across many partitions — plus equivalence with the
  * row_number window formulation on the corpus join itself.
  */
class TopKStructsSpec extends SparkSpec {
  import spark.implicits._

  test("keeps the k smallest under mixed per-field directions") {
    val df = Seq(
      ("g", 10.0, 1L), ("g", 30.0, 2L), ("g", 20.0, 3L),
      ("g", 30.0, 4L), ("g", 5.0, 5L)
    ).toDF("g", "p", "id")
      .repartition(4) // force partials + merge
    // p DESC, id ASC → 30/2, 30/4, 20/3
    val got = df.groupBy("g")
      .agg(expr("topk_structs(struct(p, id), 3, array(true, false))").as("t"))
      .select(explode($"t").as("r"))
      .select($"r.p", $"r.id").as[(Double, Long)].collect().toSeq
    assert(got == Seq((30.0, 2L), (30.0, 4L), (20.0, 3L)))
  }

  test("k larger than the group returns the whole group, sorted") {
    val got = Seq(("g", 2L), ("g", 1L)).toDF("g", "v")
      .groupBy("g")
      .agg(expr("topk_structs(struct(v), 10, array(false))").as("t"))
      .select(expr("transform(t, r -> r.v)")).as[Seq[Long]].head()
    assert(got == Seq(1L, 2L))
  }

  test("string fields order lexicographically; desc nulls last") {
    val got = Seq(("g", Some("b")), ("g", Option.empty[String]),
        ("g", Some("a")), ("g", Some("c")))
      .toDF("g", "s")
      .groupBy("g")
      .agg(expr("topk_structs(struct(s), 3, array(true))").as("t"))
      .select(expr("transform(t, r -> r.s)")).as[Seq[Option[String]]].head()
    assert(got == Seq(Some("c"), Some("b"), Some("a")))
  }

  test("matches the row_number window form on the o4 join") {
    val o = graft.Tables.orders(spark, sfDir)
    val c = graft.Tables.customer(spark, sfDir)
    val j = o.join(c, $"o_custkey" === $"c_custkey")
    val win = j.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("c_mktsegment")
          .orderBy($"o_totalprice".desc, $"o_orderkey")))
      .filter($"rn" <= 7)
      .select($"c_mktsegment", $"o_orderkey", $"rn".cast("int").as("rn"))
    val agg = j.groupBy($"c_mktsegment")
      .agg(expr(
        """topk_structs(struct(o_totalprice, o_orderkey), 7,
             array(true, false))""").as("t"))
      .select($"c_mktsegment", posexplode($"t").as(Seq("pos", "r")))
      .select($"c_mktsegment", $"r.o_orderkey".as("o_orderkey"),
        ($"pos" + 1).cast("int").as("rn"))
    assert(win.exceptAll(agg).count() == 0 && agg.exceptAll(win).count() == 0)
  }

  test("one hot group across many partitions survives serialization") {
    val df = (0 until 10000).map(i => ("g", i.toLong)).toDF("g", "v")
      .repartition(32)
    val got = df.groupBy("g")
      .agg(expr("topk_structs(struct(v), 4, array(true))").as("t"))
      .select(expr("transform(t, r -> r.v)")).as[Seq[Long]].head()
    assert(got == Seq(9999L, 9998L, 9997L, 9996L))
  }
}
