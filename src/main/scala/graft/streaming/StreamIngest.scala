package graft.streaming

import graft.lake.Lake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous raw-zone ingestion — the Structured Streaming face of the
  * reference's daily re-download + merge loop (SURVEY §2.9: "optional
  * later: Structured Streaming file source over the raw zone with
  * foreachBatch merge").
  *
  * `readStream` file source discovers newly landed raw files; every
  * micro-batch runs the same idempotent `Lake.upsert` the batch pipeline
  * uses, with the batch id as the keep-last precedence — late or corrected
  * re-publications simply win by arriving later. State is only the file
  * listing (checkpointed); the merge itself is stateless-per-batch, so a
  * 1000-executor cluster ingests the raw zone continuously with the same
  * plan the nightly batch would use.
  */
object StreamIngest {

  def start(spark: SparkSession, rawDir: String, schema: StructType,
      lakePath: String, mercado: String, dedupKeys: Seq[String],
      checkpoint: String): StreamingQuery = {
    import org.apache.spark.sql.functions._
    spark.readStream
      .schema(schema)
      .parquet(rawDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Lake.upsert(spark, batch.withColumn("batch_id", lit(batchId)),
          lakePath, mercado, dedupKeys, "batch_id")
      }
      .start()
  }
}
