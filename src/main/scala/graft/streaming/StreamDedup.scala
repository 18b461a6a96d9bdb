package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming twin of the exact-dedup operator (`llm_exact_dedup` /
  * `a5_exact_dedup` on the batch side): continuous keyed deduplication of
  * an event/document stream.
  *
  * Two arms with different state guarantees:
  *  - [[dedupForever]] — `dropDuplicates` on the key: exact dedup across
  *    the whole stream lifetime. State grows with |distinct keys|; only
  *    safe when the key space is bounded (dimension updates, daily
  *    republications).
  *  - [[dedupWithinWatermark]] — `dropDuplicatesWithinWatermark`: a
  *    duplicate is only suppressed while its first occurrence is younger
  *    than the watermark, so state is bounded by event-time width — the
  *    100 TB-stream shape. Re-downloads of the same raw file land within
  *    the lateness window, which is exactly the reference's re-download
  *    dedup scenario (utilidades/raw_file_utils.py keep-last rule) made
  *    continuous.
  *
  * Both preserve the FIRST arrival of each key (stream order), matching
  * the lake's append-then-keep-last precedence when the precedence column
  * is arrival batch id.
  */
object StreamDedup {

  def dedupForever(stream: DataFrame, keyCols: Seq[String]): DataFrame =
    stream.dropDuplicates(keyCols)

  def dedupWithinWatermark(stream: DataFrame, keyCols: Seq[String],
      eventTimeCol: String, lateness: String): DataFrame =
    stream.withWatermark(eventTimeCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)
}
