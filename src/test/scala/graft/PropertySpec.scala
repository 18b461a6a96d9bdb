package graft

import java.time.{LocalDate, ZoneId}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-style tests: randomized inputs (fixed seed), bulk-evaluated in
  * one Spark job, validated against independent Scala/java.time oracles.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val madrid = ZoneId.of("Europe/Madrid")
  private val seed = rng.Seed(42L)

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, seed).get

  test("property: quarter-index mapping matches java.time on random dates") {
    val genDate = Gen.choose(0L, 365L * 10)
      .map(LocalDate.of(2020, 1, 1).plusDays(_))
    val dates = samples(genDate, 300).distinct
    val rows = dates.map { d =>
      val quarters = (java.time.Duration.between(
        d.atStartOfDay(madrid), d.plusDays(1).atStartOfDay(madrid))
        .toMinutes / 15).toInt
      (d.toString, quarters)
    }
    val out = rows.toDF("fecha", "n")
      .withColumn("idx", explode(sequence(lit(1), col("n"))))
      .select(col("fecha"), col("idx"),
        graft.time.MadridTime.utcFromQuarterIndex(to_date(col("fecha")),
          col("idx")).as("utc"))
      .as[(String, Int, java.sql.Timestamp)].collect()
    assert(out.length == rows.map(_._2).sum)
    out.foreach { case (f, idx, ts) =>
      // independent oracle: java.time local midnight + (idx-1)×15 min
      val expected = LocalDate.parse(f).atStartOfDay(madrid).toInstant
        .plusSeconds((idx - 1) * 900L)
      assert(ts.toInstant == expected, s"$f idx=$idx")
    }
    // and each local day is exactly covered: last quarter ends at next midnight
    rows.foreach { case (f, n) =>
      val d = LocalDate.parse(f)
      val lastStart = d.atStartOfDay(madrid).toInstant.plusSeconds((n - 1) * 900L)
      assert(lastStart.plusSeconds(900) == d.plusDays(1).atStartOfDay(madrid).toInstant)
    }
  }

  test("property: keepLast keeps exactly the max-precedence row per key") {
    val genRow = for {
      k <- Gen.choose(0, 20)
      v <- Gen.choose(-1000.0, 1000.0)
    } yield (k, v)
    val raw = samples(genRow, 400).zipWithIndex
      .map { case ((k, v), i) => (k, v, i.toLong) } // unique precedence
    val df = raw.toDF("k", "v", "prec")
    val got = graft.lake.Lake.keepLast(df, Seq("k"), col("prec"))
      .select("k", "v", "prec").as[(Int, Double, Long)].collect()
    val expected = raw.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._3) }.toSet
    assert(got.toSet == expected)
    assert(got.map(_._1).distinct.length == got.length) // one row per key
  }

  test("property: European decimal parse round-trips formatted values") {
    val gen = Gen.choose(-999999999L, 999999999L).map(c => BigDecimal(c, 2))
    val vals = samples(gen, 300)
    val eu = vals.map { v =>
      val s = v.abs.setScale(2).toString
      val Array(ip, fp) = s.split("\\.")
      val grouped = ip.reverse.grouped(3).mkString(".").reverse
      (if (v < 0) "-" else "") + grouped + "," + fp
    }
    val out = eu.toDF("s")
      .select(graft.ingest.Ingest.parseEuropeanDecimal(col("s")))
      .as[Double].collect()
    out.zip(vals).foreach { case (got, want) =>
      assert(got == want.toDouble, s"$want")
    }
  }
}
