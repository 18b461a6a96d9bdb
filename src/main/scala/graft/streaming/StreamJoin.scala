package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream equi-join — the streaming twin of
  * `Reader.joinPreciosVolumenes` (J9): a precios stream and a volumenes
  * stream join on (datetime_utc, id_mercado) as both arrive.
  *
  * Both sides carry an event-time watermark and the join key includes the
  * event-time column itself, so Spark's state store evicts buffered rows
  * once the watermark passes them — state is bounded by (lateness window ×
  * arrival rate), never the stream's history. At scale the join state is
  * hash-partitioned on the key like the batch shuffle would be.
  */
object StreamJoin {

  def joinPreciosVolumenes(precios: DataFrame, volumenes: DataFrame,
      lateness: String = "1 hour"): DataFrame =
    // delegate to the batch operator so the join definition (keys, importe
    // derivation) can never silently diverge between batch and stream
    graft.query.Reader.joinPreciosVolumenes(
      precios.withWatermark("datetime_utc", lateness),
      volumenes.withWatermark("datetime_utc", lateness))

  /** LEFT-OUTER stream-stream join: precios whose volumenes never arrive
    * within the lateness window are EMITTED WITH NULLS once the watermark
    * passes their event time — the streaming answer to the reference's
    * "volumenes file missing, keep precios and re-download later" loop.
    *
    * Because the equi-join key contains the watermarked event-time column,
    * Spark uses the state-KEY watermark: a buffered left row becomes
    * definitively unmatched (and its null row is emitted) in the first
    * micro-batch after the watermark passes its key — so null emission is
    * driven purely by event time, never by micro-batch boundaries.
    */
  def joinPreciosVolumenesOuter(precios: DataFrame, volumenes: DataFrame,
      lateness: String = "1 hour"): DataFrame =
    graft.query.Reader.joinPreciosVolumenes(
      precios.withWatermark("datetime_utc", lateness),
      volumenes.withWatermark("datetime_utc", lateness), "left_outer")
}
