package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Canonical dataset schemas + validation gate — SURVEY.md §1.2/§1.3 and
  * F12 (utilidades/data_validation_utils.py:17-137).
  *
  * Types follow the reference's deliberate narrowing: FloatType values,
  * ByteType market ids, tz-naive-UTC TimestampType (session TZ is UTC).
  */
object Schemas {

  private def ts = StructField("datetime_utc", TimestampType, nullable = false)
  private def id = StructField("id_mercado", ByteType, nullable = false)

  val precios = StructType(Seq(
    ts, id, StructField("precio", FloatType, nullable = false)))

  val volumenesI90 = StructType(Seq(
    ts, StructField("up", StringType, nullable = false),
    StructField("volumenes", FloatType, nullable = false), id,
    StructField("tipo_transaccion", StringType, nullable = true)))

  val volumenesI3 = StructType(Seq(
    ts, StructField("tecnologia", StringType, nullable = false),
    StructField("volumenes", FloatType, nullable = false), id))

  val volumenesOmie = StructType(Seq(
    ts, StructField("uof", StringType, nullable = false),
    StructField("volumenes", FloatType, nullable = false), id))

  val volumenesMic = StructType(Seq(
    ts, StructField("uof", StringType, nullable = false),
    StructField("volumenes", FloatType, nullable = false),
    StructField("precio", FloatType, nullable = false), id,
    StructField("fecha_fichero", DateType, nullable = false)))

  val curtailmentsI90 = StructType(Seq(
    ts, StructField("up", StringType, nullable = false),
    StructField("RTx", StringType, nullable = false),
    StructField("tipo", StringType, nullable = false),
    StructField("volumenes", FloatType, nullable = false), id))

  val curtailmentsI3 = StructType(Seq(
    ts, StructField("tecnologia", StringType, nullable = false),
    StructField("RTx", StringType, nullable = false),
    StructField("tipo", StringType, nullable = false),
    StructField("volumenes", FloatType, nullable = false), id))

  val byName: Map[String, StructType] = Map(
    "precios" -> precios, "volumenes_i90" -> volumenesI90,
    "volumenes_i3" -> volumenesI3, "volumenes_omie" -> volumenesOmie,
    "volumenes_mic" -> volumenesMic, "curtailments_i90" -> curtailmentsI90,
    "curtailments_i3" -> curtailmentsI3)

  final case class ValidationException(msg: String) extends RuntimeException(msg)

  /** F12 — required-column presence gate + dtype coercion: missing columns
    * raise (listing all of them); present columns are cast to the declared
    * types; extra optional columns pass through untouched.
    * ref: data_validation_utils.py:33-228
    */
  def validate(df: DataFrame, schema: StructType): DataFrame = {
    val required = schema.fields.filterNot(_.nullable).map(_.name)
    val missing = required.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw ValidationException(
        s"missing required columns: ${missing.mkString(", ")}; " +
          s"present: ${df.columns.mkString(", ")}")
    val coerced = schema.fields.filter(f => df.columns.contains(f.name)).map {
      f => f.name -> col(f.name).cast(f.dataType)
    }
    coerced.foldLeft(df) { case (acc, (n, c)) => acc.withColumn(n, c) }
      .select(schema.fields.filter(f => df.columns.contains(f.name))
        .map(f => col(f.name)): _*)
  }
}
