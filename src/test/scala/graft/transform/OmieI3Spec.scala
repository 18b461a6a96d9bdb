package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OmieI3Spec extends SparkSpec {
  import spark.implicits._

  test("OMIE diario: EU decimals, matched filter, buy sign, hourly DST") {
    val raw = Seq(
      // fall-back day, hour 25 exists; matched sell
      ("2024-10-27", "UOF1", "1.234,56", "C", "V", 25),
      // matched buy → negated
      ("2024-10-27", "UOF1", "100,00", "C", "C", 25),
      // offered-not-matched → dropped
      ("2024-10-27", "UOF2", "50,00", "O", "V", 1))
      .toDF("f", "Unidad", "Energía Compra/Venta", "Ofertada (O)/Casada (C)",
        "Tipo Oferta", "Hora")
      .withColumn("Fecha", col("f").cast("date")).drop("f")
    val out = OmieTransform.transform(raw, idMercado = 1, quarterHourly = false)
    val got = out.select(col("uof"), col("datetime_utc").cast("string"),
      col("volumenes")).as[(String, String, Float)].collect()
    assert(got.length == 1) // rolled up: 1234.56 − 100.00 on same key
    assert(got.head == ("UOF1", "2024-10-27 22:00:00", 1134.56f)) // 25th hour
  }

  test("OMIE quarter-hourly: H2Q4 labels and ÷4 energy split") {
    val raw = Seq(("2024-07-15", "UOF1", "8,00", "C", "V", "H2Q4"))
      .toDF("f", "Unidad", "Energía Compra/Venta", "Ofertada (O)/Casada (C)",
        "Tipo Oferta", "Periodo")
      .withColumn("Fecha", col("f").cast("date")).drop("f")
    val out = OmieTransform.transform(raw, idMercado = 2, quarterHourly = true)
    val r = out.select(col("datetime_utc").cast("string"), col("volumenes"))
      .as[(String, Float)].head()
    // H2Q4 = quarter index 8 = local 01:45 CEST = 23:45Z prev day; 8/4 = 2
    assert(r == ("2024-07-14 23:45:00", 2.0f))
  }

  test("MIC continuo: contract parse, two-sided trades, append grain") {
    val raw = Seq(("20241027-05 XX", "45,50", "10,00", "BUYER1", "SELLER1"))
      .toDF("Contrato", "Precio", "Cantidad", "Unidad compra", "Unidad venta")
    val out = OmieTransform.transformContinuo(raw)
    val got = out.select(col("uof"), col("volumenes"), col("precio"))
      .as[(String, Float, Float)].collect().toSet
    assert(got == Set(("SELLER1", 10.0f, 45.5f), ("BUYER1", -10.0f, 45.5f)))
    // delivery hour 5 on the fall-back day: local hour index 5 = 02:00Z
    assert(out.select(col("datetime_utc").cast("string")).as[String]
      .collect().forall(_ == "2024-10-27 02:00:00"))
  }

  test("I3: technology semi-join + Programa map, unmapped dropped") {
    val ts = "2024-07-15 10:00:00"
    val raw = Seq(
      ("Eólica", "PHF-2", 10.0), ("Nuclear", "PHF-1", 20.0),
      ("Desconocida", "PHF-1", 30.0), ("Eólica", "PHF-9", 40.0))
      .toDF("Concepto", "Programa", "volumenes")
      .withColumn("datetime_utc", lit(ts).cast("timestamp"))
    val dim = Seq("Eólica", "Nuclear").toDF("tecnologia")
    val out = I3Transform.transform(raw, dim)
    val got = out.select(col("tecnologia"), col("id_mercado").cast("int"))
      .as[(String, Int)].collect().toSet
    assert(got == Set(("Eólica", 3), ("Nuclear", 2))) // unknown tech + PHF-9 dropped
  }

  test("curtailment: Bajar filter + RTx derivation + id 13") {
    val ts = "2024-07-15 10:00:00"
    val raw = Seq(
      ("UP1", "Bajar", "UPLPVPV", 5.0), ("UP2", "Bajar", "Restricciones Técnicas", 6.0),
      ("UP3", "Subir", "UPLPVPV", 7.0), ("UP4", "Bajar", "Otro", 8.0))
      .toDF("up", "Sentido", "Redespacho", "volumenes")
      .withColumn("datetime_utc", lit(ts).cast("timestamp"))
    val out = I3Transform.transformCurtailment(raw, "up")
    val got = out.select(col("up"), col("RTx"), col("id_mercado").cast("int"))
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("UP1", "R1", 13), ("UP2", "R5", 13)))
  }
}
