package graft.time

import java.time.{LocalDate, ZoneId}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Madrid DST time kernel — SURVEY.md §2.5 (W1-W9).
  *
  * The reference splits every transform into a vectorized non-DST path and a
  * row-wise scalar path for DST days (etl_date_utils.py:69-149, 304-577).
  * Formulated in UTC arithmetic none of that is needed: local Madrid
  * midnight is converted to UTC once, and 1-based interval indices are pure
  * offsets on the continuous UTC axis — spring-forward (92-interval) and
  * fall-back (100-interval) days fall out automatically. Zero UDFs; every
  * helper is a codegen-friendly Column expression.
  */
object MadridTime {

  val Zone = "Europe/Madrid"

  /** W1 — DST calendar dimension from java.time.zone.ZoneRules (the public
    * equivalent of the reference's pytz transition-table introspection,
    * etl_date_utils.py:18-66). One row per local date:
    * transition_type 0 = normal (96 quarters), 1 = fall-back (100),
    * 2 = spring-forward (92). Tiny (≤ a few thousand rows) — broadcast it.
    */
  def calendarDim(spark: SparkSession, fromYear: Int, toYear: Int): DataFrame = {
    // Day length under the zone rules decides the type — works for both the
    // historical transition list and the recurring (future) rules, which
    // ZoneRules.getTransitions alone does not cover.
    val zone = ZoneId.of(Zone)
    val rows = Iterator.iterate(LocalDate.of(fromYear, 1, 1))(_.plusDays(1))
      .takeWhile(!_.isAfter(LocalDate.of(toYear, 12, 31)))
      .map { d =>
        val hours = java.time.Duration.between(
          d.atStartOfDay(zone), d.plusDays(1).atStartOfDay(zone)).toHours
        val tt = hours match { case 23 => 2; case 25 => 1; case _ => 0 }
        val quarters = (hours * 4).toInt
        (java.sql.Date.valueOf(d), tt, quarters)
      }.toSeq
    import spark.implicits._
    rows.toDF("fecha", "transition_type", "quarters_in_day")
  }

  /** The default W1 calendar: 1990-2050. Wide on purpose — the dim is
    * ~22k rows (always broadcast-sized), so covering six decades costs
    * nothing, while an under-sized range would silently null
    * `transition_type` for out-of-range dates (the r5 advice finding;
    * `I90Transform.standardizeDatetime` now also raises on any date that
    * still falls outside).
    */
  def defaultCalendar(spark: SparkSession): DataFrame =
    calendarDim(spark, 1990, 2050)

  /** Local Madrid midnight of `fecha` (a date or date-string column) on the
    * UTC axis — the anchor for all index arithmetic.
    */
  def localMidnightUtc(fecha: Column): Column =
    to_utc_timestamp(fecha.cast(TimestampType), Zone)

  /** W4 — 1-based 15-minute interval index → UTC timestamp.
    * Index runs 1..96 on normal days, 1..92 spring-forward, 1..100
    * fall-back (etl_date_utils.py:440-577); because UTC is continuous the
    * same formula covers all three.
    */
  def utcFromQuarterIndex(fecha: Column, idx: Column): Column =
    localMidnightUtc(fecha) + make_interval(
      lit(0), lit(0), lit(0), lit(0), lit(0), (idx - 1) * 15, lit(0))

  /** W6 — 1-based hour index (1..23/24/25, OMIE convention) → UTC.
    * ref: _procesador_omie.py:403-465, 521-613
    */
  def utcFromHourIndex(fecha: Column, hora: Column): Column =
    localMidnightUtc(fecha) + make_interval(
      lit(0), lit(0), lit(0), lit(0), hora - 1, lit(0), lit(0))

  /** W3 — hourly label parse: "HH-HH+1" with optional DST suffix
    * ("02-03a" = first occurrence / CEST, "02-03b" = second / CET on the
    * fall-back day). ref: etl_date_utils.py:361-438.
    *
    * UTC offset from local midnight (hours) =
    *   normal day:        h
    *   spring-forward:    h      (h<3)   |  h-1  (h≥3; hour 2 absent)
    *   fall-back:         h      (h<2 or suffix a at h=2)
    *                      h+1    (suffix b at h=2, or h≥3)
    * `transitionType` is the W1 calendar column joined on the local date.
    */
  def utcFromHourLabel(fecha: Column, label: Column, transitionType: Column): Column = {
    val h = regexp_extract(label, "^(\\d{1,2})", 1).cast(IntegerType)
    val suffix = regexp_extract(label, "([ab])$", 1)
    val offset =
      when(transitionType === 2, when(h >= 3, h - 1).otherwise(h))
        .when(transitionType === 1,
          when(h === 2 && suffix === "b", h + 1)
            .when(h >= 3, h + 1)
            .otherwise(h))
        .otherwise(h)
    localMidnightUtc(fecha) + make_interval(
      lit(0), lit(0), lit(0), lit(0), offset, lit(0), lit(0))
  }

  /** W7 — OMIE "H2Q4" 15-minute label → 1-based quarter index.
    * ref: _procesador_omie.py:277-298
    */
  def quarterIndexFromH2Q4(label: Column): Column =
    ((regexp_extract(label, "H(\\d{1,2})Q(\\d)", 1).cast(IntegerType) - 1) * 4
      + regexp_extract(label, "H(\\d{1,2})Q(\\d)", 2).cast(IntegerType))

  /** W8 — MIC contract code parse: "YYYYMMDD-HH…" → (delivery date, 1-based
    * hour). ref: _procesador_omie.py:258-273
    */
  def micDeliveryDate(contrato: Column): Column =
    to_date(substring(contrato, 1, 8), "yyyyMMdd")

  def micDeliveryHour(contrato: Column): Column =
    substring(contrato, 10, 2).cast(IntegerType)

  /** W5 — hourly → 15-minute upsample: one row per quarter, volumes ÷4,
    * prices replicated. ref: etl_date_utils.py:826-863
    */
  def upsampleHourly(df: DataFrame, tsCol: String, valueCol: String,
      divideValue: Boolean): DataFrame = {
    val exploded = df.withColumn("__q", explode(sequence(lit(0), lit(3))))
      .withColumn(tsCol, col(tsCol) + make_interval(
        lit(0), lit(0), lit(0), lit(0), lit(0), col("__q") * 15, lit(0)))
    val scaled =
      if (divideValue) exploded.withColumn(valueCol, col(valueCol) / 4)
      else exploded
    scaled.drop("__q")
  }

  /** A2 — 15-minute → hourly downsample: numeric mean per hour bucket,
    * `first` label columns via min (deterministic under parallelism).
    * ref: etl_date_utils.py:866-937
    */
  def downsampleToHour(df: DataFrame, tsCol: String, keyCols: Seq[String],
      avgCols: Seq[String], firstCols: Seq[String]): DataFrame = {
    val aggs = avgCols.map(c => avg(col(c)).as(c)) ++
      firstCols.map(c => min(col(c)).as(c))
    df.groupBy((date_trunc("hour", col(tsCol)).as(tsCol) +:
        keyCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** W9 — tz conversion pair (Madrid wall clock ↔ UTC). */
  def toUtc(local: Column): Column = to_utc_timestamp(local, Zone)
  def toMadrid(utc: Column): Column = from_utc_timestamp(utc, Zone)
}
