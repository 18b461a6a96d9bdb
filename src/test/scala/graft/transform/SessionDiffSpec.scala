package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionDiffSpec extends SparkSpec {
  import spark.implicits._

  private val ts = "2024-01-01 10:00:00"
  private def df(rows: (String, String, Double)*) =
    rows.toSeq.toDF("dt", "up", "volumenes")
      .withColumn("datetime_utc", col("dt").cast("timestamp")).drop("dt")

  test("J1/W10: sessions diff against previous present session, baseline 0") {
    val diario = df((ts, "UP1", 100.0), (ts, "UP2", 50.0))
      .withColumn("tipo_transaccion", lit("Mercado"))
    val s1 = df((ts, "UP1", 110.0), (ts, "UP2", 45.0))
    val s2 = df((ts, "UP1", 105.0)) // UP2 absent in session 2
    val out = SessionDiff.intraNetVolumes(Some(diario),
        Seq(1 -> s1, 2 -> s2), "up", Some("tipo_transaccion"))
      .select(col("up"), col("session"), col("volumenes"))
      .as[(String, Int, Double)].collect().toSet
    assert(out == Set(
      ("UP1", 1, 10.0),  // 110 − 100 (diario)
      ("UP1", 2, -5.0),  // 105 − 110 (prev present = s1)
      ("UP2", 1, -5.0))) // 45 − 50
  }

  test("entity missing from baseline diffs against 0 (fillna semantics)") {
    val diario = df((ts, "UP1", 100.0)).withColumn("tipo_transaccion", lit("Mercado"))
    val s1 = df((ts, "UPNEW", 30.0))
    val out = SessionDiff.intraNetVolumes(Some(diario), Seq(1 -> s1), "up",
        Some("tipo_transaccion"))
      .select("volumenes").as[Double].collect()
    assert(out.sameElements(Array(30.0)))
  }

  test("missing diario baseline passes intra through unchanged") {
    val s1 = df((ts, "UP1", 42.0))
    val out = SessionDiff.intraNetVolumes(None, Seq(1 -> s1), "up")
      .select("volumenes").as[Double].collect()
    assert(out.sameElements(Array(42.0)))
  }

  test("J2 baseline prep filters Mercado rows and sums per entity") {
    val diario = Seq(
      (ts, "UP1", 60.0, "Mercado"), (ts, "UP1", 40.0, "Mercado"),
      (ts, "UP1", 999.0, "Otro"))
      .toDF("dt", "up", "volumenes", "tipo_transaccion")
      .withColumn("datetime_utc", col("dt").cast("timestamp")).drop("dt")
    val out = SessionDiff.diarioBaseline(diario, "up", Some("tipo_transaccion"))
      .select("volumenes").as[Double].collect()
    assert(out.sameElements(Array(100.0)))
  }
}
