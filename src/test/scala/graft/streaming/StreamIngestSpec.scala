package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  test("file-source stream ingests raw batches with keep-last lake merge") {
    val rawDir = tmpDir() + "/raw"
    val lake = tmpDir() + "/lake"
    val ckpt = tmpDir() + "/ckpt"
    def mkBatch(rows: (String, Int, Double)*) = rows.toSeq
      .toDF("dt", "id_mercado", "precio")
      .withColumn("datetime_utc", col("dt").cast("timestamp")).drop("dt")
      .select("datetime_utc", "id_mercado", "precio") // stable column order

    // land batch 1, run the stream to completion (AvailableNow)
    mkBatch(("2024-01-01 00:00:00", 1, 10.0), ("2024-01-01 00:15:00", 1, 11.0))
      .write.mode("append").parquet(rawDir)
    val schema = spark.read.parquet(rawDir).schema
    val q1 = StreamIngest.start(spark, rawDir, schema, lake, "diario",
      Seq("datetime_utc", "id_mercado"), ckpt)
    q1.awaitTermination(60000)
    assert(spark.read.parquet(lake).count() == 2)

    // land a correction file; restart discovers only the new file
    mkBatch(("2024-01-01 00:00:00", 1, 99.0))
      .write.mode("append").parquet(rawDir)
    val q2 = StreamIngest.start(spark, rawDir, schema, lake, "diario",
      Seq("datetime_utc", "id_mercado"), ckpt)
    q2.awaitTermination(60000)
    val got = spark.read.parquet(lake)
      .select(col("datetime_utc").cast("string"), col("precio"))
      .as[(String, Double)].collect().toMap
    assert(got == Map(
      "2024-01-01 00:00:00" -> 99.0, // corrected by the later batch
      "2024-01-01 00:15:00" -> 11.0))
  }

  test("error-date masking drops known-bad publication days") {
    import graft.transform.MarketFilters
    val df = Seq(("2024-06-01 10:00:00", 1.0), ("2024-06-02 10:00:00", 2.0))
      .toDF("dt", "v").withColumn("datetime_utc", col("dt").cast("timestamp"))
    val out = MarketFilters.maskErrorDates(df, "datetime_utc", Seq("2024-06-01"))
    assert(out.select("v").as[Double].collect().sameElements(Array(2.0)))
  }
}
