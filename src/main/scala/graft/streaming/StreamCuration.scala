package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Streaming twin of the corpus-curation filters (batch:
  * `llm_quality_score` in graft.queries.LlmOps, `llm_pii_redact` in
  * graft.queries.Curation):
  * quality-gate and PII-scrub a continuous document stream.
  *
  * Every expression here is a pure narrow map — no aggregation, no state
  * store, no watermark — so the SAME function body runs under
  * `readStream` and batch unchanged (StreamCurationSpec proves the
  * outputs identical row-for-row). That statelessness is the point at
  * scale: a curation pass over a firehose is scan-bound, and adding it to
  * an ingest stream costs no shuffle.
  */
object StreamCuration {

  /** Filter out documents under `minTokens` whitespace tokens, redact
    * email/phone identifiers, and attach the quality signals the batch
    * scorer publishes. Works on streaming and batch DataFrames alike.
    */
  def curate(df: DataFrame, minTokens: Int): DataFrame = {
    val nTok = size(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0)))
    val nStop = size(regexp_extract_all(col("text"), lit(" the "), lit(0)))
    val redacted = regexp_replace(
      regexp_replace(col("text"), "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
      "[0-9]{3}-[0-9]{4}", "<PHONE>")
    df.withColumn("n_tok", nTok)
      .filter(col("n_tok") >= minTokens)
      .withColumn("stop_ratio", nStop.cast(DoubleType) / col("n_tok"))
      .withColumn("clean_text", redacted)
  }
}
