package graft.queries

import graft.Tables._
import graft.lake.Lake
import graft.transform.EsiosTransform
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end pipeline queries: the full composition the driver's oracle
  * gate otherwise never sees — raw-shaped input → transform → lake upsert →
  * pruned typed read — registered as one query, with the whole chain
  * re-expressed as a DuckDB CTE pipeline as the oracle.
  * ref lifecycle: transform/_procesadores/_procesador_esios.py:320-329,
  * utilidades/data_lake_loader.py:84-140.
  */
object Pipelines {

  type Q = (SparkSession, String) => DataFrame

  /** ESIOS e2e. The raw fixture is derived deterministically from `events`:
    * hour-truncated timestamps, indicator cycling over three mapped ids,
    * mixed hourly/quarter granularity, and an occasional foreign geo (to
    * exercise the F2 conditional filter). `precio` is a pure function of
    * (hour, indicator) so rows that collide on the lake dedup key carry
    * identical values — keep-last stays deterministic regardless of which
    * physical row survives.
    */
  val all: Seq[(String, Q, Option[String])] = Seq(
    ("pipeline_esios_e2e",
      (s, d) => {
        val h = date_trunc("hour", col("ts"))
        val ind = element_at(typedLit(Seq(600, 612, 613)),
          (pmod(col("event_id"), lit(3)) + 1).cast(IntegerType))
        val raw = events(s, d).select(
          h.as("datetime_utc"),
          ((expr("unix_seconds(date_trunc('hour', ts)) div 3600") % 997) + ind)
            .cast(DoubleType).as("value"),
          ind.as("indicador_id"),
          when(pmod(col("event_id"), lit(2)) === 0, "Hora")
            .otherwise("Quince minutos").as("granularidad"),
          when(pmod(col("event_id"), lit(7)) === 0, "Francia")
            .otherwise("España").as("geo_name"))
        val out = EsiosTransform.transform(raw).withColumn("batch_id", lit(1L))
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_e2e_esios_" +
          java.lang.Integer.toHexString(d.hashCode)
        Lake.upsert(s, out, path, "diario",
          Seq("datetime_utc", "id_mercado"), "batch_id")
        Lake.read(s, path, Some("diario"))
          .select(col("datetime_utc"),
            col("id_mercado").cast(IntegerType).as("id_mercado"), col("precio"))
      },
      Some("""WITH raw AS (
                SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                       event_id,
                       [600, 612, 613][CAST(event_id % 3 AS INTEGER) + 1] AS ind,
                       CASE WHEN event_id % 2 = 0 THEN 'Hora'
                            ELSE 'Quince minutos' END AS gran,
                       CASE WHEN event_id % 7 = 0 THEN 'Francia'
                            ELSE 'España' END AS geo
                FROM events),
              v AS (
                SELECT h, ind, gran,
                       CAST((epoch_us(h) // 3600000000) % 997 + ind AS DOUBLE)
                         AS precio
                FROM raw WHERE geo = 'España'),
              m AS (
                SELECT h, gran, precio,
                       CASE ind WHEN 600 THEN 1 WHEN 612 THEN 2
                                WHEN 613 THEN 3 END AS id_mercado
                FROM v),
              up AS (
                SELECT h + to_minutes(CAST(q * 15 AS BIGINT)) AS datetime_utc,
                       id_mercado, precio
                FROM m, generate_series(0, 3) t(q) WHERE gran = 'Hora'
                UNION ALL
                SELECT h AS datetime_utc, id_mercado, precio
                FROM m WHERE gran <> 'Hora')
              SELECT DISTINCT datetime_utc, CAST(id_mercado AS INTEGER) AS id_mercado,
                     precio
              FROM up"""))
  )
}
