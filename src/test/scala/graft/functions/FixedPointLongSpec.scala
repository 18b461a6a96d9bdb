package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** FixedPointLong must be BIT-IDENTICAL to the expression it replaces —
  * `(CAST(x AS DECIMAL(18,s)) * 10^s)::BIGINT` — on every double the cast
  * itself accepts, and must reproduce the cast's edge behavior elsewhere:
  * shortest-representation ties (2.00005) take the slow path, NaN/Inf
  * are null, precision overflow throws under ANSI and is null otherwise.
  * Both the codegen'd arm (DataFrame select) and the interpreted arm
  * (the object eval) are exercised.
  */
class FixedPointLongSpec extends SparkSpec {
  import spark.implicits._

  private def reference(scale: Int)(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(18, scale)) * math.pow(10, scale).toLong)
      .cast(LongType)

  // every value here survives CAST(x AS DECIMAL(18,s)) for s <= 4
  private val inRange: Seq[Double] = Seq(
    0.0, -0.0, 1.0, -1.0, 0.1, 0.3, 0.30000000000000004,
    2.00005, -2.00005, 0.00005, -0.00005, 0.5, -0.5, 0.05, -0.05,
    0.005, -0.005, 0.0005, -0.0005, 0.00004999999999999999,
    123.45645, 123.45655, -123.45645, 999999999.9999,
    1.0e9, -1.0e9, 1.0000000001e9, 4.5e11, 9.9999999999e12,
    Double.MinPositiveValue, Double.NaN,
    Double.PositiveInfinity, Double.NegativeInfinity,
    95063.36, 0.04, 0.07, 7.11, 36.25) ++
    // deterministic sweep: clean 2/4-decimal values (the data regime) and
    // raw doubles (the slow-path regime)
    (1 to 2000).flatMap { i =>
      val r = new scala.util.Random(i)
      Seq(r.nextInt(1000000) / 100.0, r.nextInt(100000000) / 10000.0,
        r.nextDouble() * math.pow(10, r.nextInt(14) - 4))
    }

  for (scale <- Seq(2, 4))
    test(s"differential vs the decimal-cast reference, scale $scale") {
      val df = inRange.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val rows = df.select($"id",
          call_function(s"unscaled$scale", $"v").as("got"),
          reference(scale)($"v").as("want"))
        .as[(Long, Option[Long], Option[Long])].collect()
      assert(rows.length == inRange.length)
      for ((id, got, want) <- rows)
        assert(got == want,
          s"scale=$scale v=${inRange(id.toInt)} got=$got want=$want")
      // interpreted arm agrees with the codegen arm
      val byId = rows.map(r => r._1 -> r._2).toMap
      for ((v, i) <- inRange.zipWithIndex) {
        val interp = FixedPointLong.eval(v, math.pow(10, scale), scale,
          nullOnOverflow = false)
        assert(Option(interp).map(_.asInstanceOf[Long]) == byId(i.toLong),
          s"interpreted/codegen disagree at $v scale=$scale")
      }
    }

  test("overflow: ANSI throws the Spark arithmetic error, non-ANSI nulls") {
    val df = Seq(1.0e18).toDF("v")
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val eGot = intercept[Exception] {
        df.select(call_function("unscaled2", $"v")).collect()
      }
      val eWant = intercept[Exception] {
        df.select(reference(2)($"v")).collect()
      }
      assert(eGot.getClass == eWant.getClass,
        s"got ${eGot.getClass}, cast throws ${eWant.getClass}")
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val got = df.select(call_function("unscaled2", $"v"))
        .as[Option[Long]].head()
      assert(got.isEmpty, "non-ANSI overflow must be null like the cast")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
  }

  test("null input stays null; sum parity with the decimal formulation") {
    val df = Seq(Some(1.23), None, Some(4.56), Some(-7.89))
      .toDF("v")
    val got = df.agg((sum(call_function("unscaled2", $"v")) / 100.0)
      .as("s")).as[Double].head()
    val want = df.agg((sum(($"v".cast(DecimalType(18, 2)) * 100)
      .cast(LongType)) / 100.0).as("s")).as[Double].head()
    assert(got == want && got == -2.10)
  }
}
