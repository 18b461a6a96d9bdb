package graft.transform

import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** I3 (per-technology) and curtailment pipelines — SURVEY.md §2 F5/F6/F7
  * (_procesador_i3.py:37-161, _procesador_curtailments.py:28-101).
  */
object I3Transform {

  /** F5 — Programa → Intra session → market id (two chained map lookups,
    * configs/i3_config.py:180-188).
    */
  val ProgramaToId: Map[String, Int] = Map(
    "PHF-1" -> 2, "PHF-2" -> 3, "PHF-3" -> 4, "PHF-4" -> 5,
    "PHF-5" -> 6, "PHF-6" -> 7, "PHF-7" -> 8)

  /** F6 + F5: keep known technologies (broadcast left-semi against the dim),
    * map Programa to id_mercado, drop unmapped.
    */
  def transform(raw: DataFrame, techDim: DataFrame): DataFrame = {
    val tech = raw.join(broadcast(techDim),
      raw("Concepto") === techDim("tecnologia"), "left_semi")
    val mapped = tech.withColumn("id_mercado",
        element_at(typedLit(ProgramaToId), col("Programa")).cast(ByteType))
      .filter(col("id_mercado").isNotNull)
    val fin = mapped.withColumnRenamed("Concepto", "tecnologia")
      .select("datetime_utc", "tecnologia", "volumenes", "id_mercado")
    Schemas.validate(fin, Schemas.volumenesI3)
  }

  /** F7 — curtailment filter + RTx derivation (configs/curtailment_config
    * R1/R5 redespacho sets), up or tecnologia grain.
    */
  def transformCurtailment(raw: DataFrame, entityCol: String): DataFrame = {
    val r1 = Seq("UPLPVPV", "UPLPVPCBN")
    val r5 = Seq("Restricciones Técnicas")
    val out = MarketFilters.curtailmentRtx(raw, "Sentido", "Redespacho", r1, r5)
      .withColumn("tipo", col("Redespacho"))
      .select(Seq(col("datetime_utc"), col(entityCol), col("RTx"), col("tipo"),
        col("volumenes"), col("id_mercado")): _*)
    val schema = if (entityCol == "up") Schemas.curtailmentsI90
      else Schemas.curtailmentsI3
    Schemas.validate(out, schema)
  }
}
