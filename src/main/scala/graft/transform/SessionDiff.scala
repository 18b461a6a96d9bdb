package graft.transform

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Intra-session cumulative differencing — SURVEY.md §2.3 J1/J2 + §2.5 W10
  * (_procesador_i90.py:307-553).
  *
  * Intra sessions are cumulative programs; the net volume of session s is
  * program(s) − program(previous *present* session), with the diario
  * baseline acting as session 0. The reference runs an iterative left-join
  * per session; here all sessions union once and a single lag window over
  * the session axis produces every diff in one shuffle — the "previous
  * present session" chaining (ref :376-379) is exactly lag(1) over the
  * sessions that actually exist for that (entity, datetime) pair, with the
  * baseline filling the gap at the front.
  */
object SessionDiff {

  /** J2 — diario baseline prep: filter market transactions, aggregate per
    * (datetime, entity). ref: _procesador_i90.py:448-502
    */
  def diarioBaseline(diario: DataFrame, entityCol: String,
      tipoCol: Option[String]): DataFrame = {
    val filtered = tipoCol.map(t => diario.filter(col(t) === "Mercado"))
      .getOrElse(diario)
    filtered.na.fill(0, Seq("volumenes"))
      .groupBy(col("datetime_utc"), col(entityCol))
      .agg(sum(col("volumenes")).as("volumenes"))
      .withColumn("session", lit(0))
  }

  /** J1/W10 — one-pass session differencing. Input: union of baseline
    * (session 0) and intra sessions (1..n) with columns
    * (datetime_utc, entity, session, volumenes, id_mercado?).
    * Output: intra rows with volumenes replaced by the session-over-session
    * delta; missing previous volume ⇒ 0 (the reference's fillna(0),
    * ref :533-537).
    */
  def diffSessions(unioned: DataFrame, entityCol: String): DataFrame = {
    val w = Window.partitionBy(col("datetime_utc"), col(entityCol))
      .orderBy(col("session"))
    unioned
      .withColumn("__prev", coalesce(lag(col("volumenes"), 1).over(w), lit(0.0)))
      .withColumn("volumenes", col("volumenes") - col("__prev"))
      .filter(col("session") > 0) // baseline rows are input, not output
      .drop("__prev")
  }

  /** Full pipeline: diario + sessions → per-session net volumes. When the
    * diario baseline is missing entirely the intra data passes through
    * unchanged (ref: _procesador_i90.py:341-343) — callers pass None.
    */
  def intraNetVolumes(diario: Option[DataFrame], sessions: Seq[(Int, DataFrame)],
      entityCol: String, tipoCol: Option[String] = None): DataFrame = {
    val tagged = sessions.map { case (s, df) =>
      df.select(col("datetime_utc"), col(entityCol), col("volumenes"))
        .withColumn("session", lit(s))
    }
    diario match {
      case None =>
        // no baseline ⇒ intra programs pass through unchanged (ref :341-343)
        tagged.reduce(_ unionByName _)
      case Some(d) =>
        val baseline = diarioBaseline(d, entityCol, tipoCol)
          .select(col("datetime_utc"), col(entityCol), col("volumenes"),
            col("session"))
        diffSessions((baseline +: tagged).reduce(_ unionByName _), entityCol)
    }
  }
}
