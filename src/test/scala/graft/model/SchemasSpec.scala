package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SchemasSpec extends SparkSpec {
  import spark.implicits._

  test("F12 validate coerces dtypes to the canonical narrow types") {
    val df = Seq(("2024-01-01 00:00:00", 1, 42.123456789))
      .toDF("dt", "id_mercado", "precio")
      .withColumn("datetime_utc", col("dt").cast("timestamp")).drop("dt")
    val out = Schemas.validate(df, Schemas.precios)
    val fields = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(fields("precio") == FloatType)
    assert(fields("id_mercado") == ByteType)
    assert(fields("datetime_utc") == TimestampType)
    assert(out.columns.sameElements(Array("datetime_utc", "id_mercado", "precio")))
  }

  test("F12 validate raises listing every missing required column") {
    val df = Seq((1, 2.0)).toDF("id_mercado", "x")
    val e = intercept[Schemas.ValidationException] {
      Schemas.validate(df, Schemas.precios)
    }
    assert(e.getMessage.contains("datetime_utc") && e.getMessage.contains("precio"))
  }

  test("optional columns pass through when present, skip when absent") {
    val base = Seq(("2024-01-01 00:00:00", "UP1", 1.0, 3))
      .toDF("dt", "up", "volumenes", "id_mercado")
      .withColumn("datetime_utc", col("dt").cast("timestamp")).drop("dt")
    assert(!Schemas.validate(base, Schemas.volumenesI90)
      .columns.contains("tipo_transaccion"))
    val withOpt = base.withColumn("tipo_transaccion", lit("Mercado"))
    assert(Schemas.validate(withOpt, Schemas.volumenesI90)
      .columns.contains("tipo_transaccion"))
  }
}
