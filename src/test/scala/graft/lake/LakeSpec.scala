package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LakeSpec extends SparkSpec {
  import spark.implicits._

  private def batch(prec: Int, rows: (String, Int, Double)*) =
    rows.toSeq.toDF("dt", "id_mercado", "precio")
      .withColumn("datetime_utc", col("dt").cast("timestamp")).drop("dt")
      .withColumn("batch_id", lit(prec))

  test("S7/A4 upsert is an idempotent keep-last merge per key") {
    val path = tmpDir() + "/lake"
    Lake.upsert(spark, batch(1,
      ("2024-01-01 00:00:00", 1, 10.0), ("2024-01-01 00:15:00", 1, 11.0),
      ("2024-02-01 00:00:00", 1, 20.0)),
      path, "diario", Seq("datetime_utc", "id_mercado"), "batch_id")
    // second batch: corrects one row, adds one, leaves feb untouched
    Lake.upsert(spark, batch(2,
      ("2024-01-01 00:00:00", 1, 99.0), ("2024-01-01 00:30:00", 1, 12.0)),
      path, "diario", Seq("datetime_utc", "id_mercado"), "batch_id")
    val got = spark.read.parquet(path)
      .select(col("datetime_utc").cast("string"), col("precio"))
      .as[(String, Double)].collect().toMap
    assert(got == Map(
      "2024-01-01 00:00:00" -> 99.0, // corrected by batch 2 (keep-last)
      "2024-01-01 00:15:00" -> 11.0,
      "2024-01-01 00:30:00" -> 12.0,
      "2024-02-01 00:00:00" -> 20.0))
    // hive layout exists
    assert(new java.io.File(s"$path/mercado=diario/id_mercado=1/year=2024/month=1")
      .exists())
  }

  test("upsert with empty dedup keys is append-only (MIC rule)") {
    val path = tmpDir() + "/mic"
    Lake.upsert(spark, batch(1, ("2024-01-01 00:00:00", 1, 5.0)),
      path, "continuo", Nil, "batch_id")
    Lake.upsert(spark, batch(2, ("2024-01-01 00:00:00", 1, 5.0)),
      path, "continuo", Nil, "batch_id")
    assert(spark.read.parquet(path).count() == 2) // duplicates allowed
  }

  test("S11 read prunes partitions (PartitionFilters in the plan)") {
    val path = tmpDir() + "/lake2"
    Lake.upsert(spark, batch(1,
      ("2024-01-01 00:00:00", 1, 1.0), ("2024-06-01 00:00:00", 2, 2.0)),
      path, "diario", Seq("datetime_utc", "id_mercado"), "batch_id")
    val df = Lake.read(spark, path, Some("diario"), Seq(1),
      Some("2024-01-01"), Some("2024-01-31"))
    assert(df.collect().map(_.getAs[Double]("precio")).sameElements(Array(1.0)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("id_mercado"))
  }

  test("compaction merges small files without changing rows") {
    val path = tmpDir() + "/mic2"
    // five append-only batches → ≥5 files in the single touched partition
    (1 to 5).foreach { b =>
      Lake.upsert(spark, batch(b,
        ("2024-01-01 00:00:00", 1, b.toDouble),
        ("2024-01-01 01:00:00", 1, b + 0.5)),
        path, "continuo", Nil, "batch_id")
    }
    def files() = {
      val d = new java.io.File(
        s"$path/mercado=continuo/id_mercado=1/year=2024/month=1")
      d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    def rows() = spark.read.parquet(path)
      .select(col("datetime_utc").cast("string"), col("precio"), col("batch_id"))
      .as[(String, Double, Int)].collect().sorted.toSeq
    val before = rows()
    assert(files() >= 5)
    assert(Lake.compact(spark, path, maxFiles = 1) == 1)
    assert(files() == 1, "partition not compacted to one file")
    assert(rows() == before, "compaction changed row content")
    // already compact ⇒ no-op
    assert(Lake.compact(spark, path, maxFiles = 1) == 0)
  }

  test("compaction touches only oversized partitions across a multi-month lake") {
    val path = tmpDir() + "/mic3"
    // month 1 gets five small batches; month 2 gets one (already compact)
    (1 to 5).foreach { b =>
      Lake.upsert(spark, batch(b, ("2024-01-01 00:00:00", 1, b.toDouble)),
        path, "continuo", Nil, "batch_id")
    }
    Lake.upsert(spark, batch(9, ("2024-02-01 00:00:00", 1, 9.0)),
      path, "continuo", Nil, "batch_id")
    val before = spark.read.parquet(path)
      .select(col("datetime_utc").cast("string"), col("precio"), col("batch_id"))
      .as[(String, Double, Int)].collect().sorted.toSeq
    // only the january partition exceeds the threshold
    assert(Lake.compact(spark, path, maxFiles = 2) == 1)
    val feb = new java.io.File(
      s"$path/mercado=continuo/id_mercado=1/year=2024/month=2")
    assert(feb.listFiles().count(_.getName.endsWith(".parquet")) == 1,
      "already-compact partition was rewritten")
    val after = spark.read.parquet(path)
      .select(col("datetime_utc").cast("string"), col("precio"), col("batch_id"))
      .as[(String, Double, Int)].collect().sorted.toSeq
    assert(after == before, "compaction changed row content")
  }

  test("S9 latest partition") {
    val path = tmpDir() + "/lake3"
    Lake.upsert(spark, batch(1,
      ("2023-12-01 00:00:00", 1, 1.0), ("2024-03-01 00:00:00", 1, 2.0)),
      path, "diario", Seq("datetime_utc", "id_mercado"), "batch_id")
    assert(Lake.latestPartition(spark, path) == (2024, 3))
  }

  test("upsert keep-last matches a driver-side replay on random batches") {
    // seeded randomized differential test (the RandomizedOpsSpec pattern)
    // for the CORE lake semantic: random batch sequences with intra-batch
    // duplicates, keys scattered across three month partitions, replayed
    // against a plain driver-side map where a later batch always wins.
    // Values are a pure function of (key, batch) so intra-batch duplicate
    // rows are byte-identical — the same determinism rule production
    // batches follow (equal-precedence ties pick an arbitrary physical
    // row, so tied rows must agree on content).
    val rnd = new scala.util.Random(2024)
    for (round <- 1 to 3) {
      val path = tmpDir() + s"/rlake$round"
      val ref = scala.collection.mutable.Map[(String, Int), Double]()
      for (b <- 1 to 4) {
        val rows = Seq.fill(30) {
          val dt = "2024-0%d-01 00:%02d:00".format(
            1 + rnd.nextInt(3), rnd.nextInt(4) * 15)
          val id = 1 + rnd.nextInt(2)
          (dt, id, (b * 1000 + math.abs((dt, id).hashCode % 97)).toDouble)
        }
        rows.foreach { case (dt, id, v) => ref((dt, id)) = v }
        Lake.upsert(spark, batch(b, rows: _*), path, "diario",
          Seq("datetime_utc", "id_mercado"), "batch_id")
      }
      val rows = spark.read.parquet(path)
        .select(col("datetime_utc").cast("string"), col("id_mercado"),
          col("precio"))
        .as[(String, Int, Double)].collect()
      // row-count FIRST: .toMap would nondeterministically mask a
      // leftover stale duplicate for a key (review r10)
      assert(rows.length == ref.size,
        s"round $round: ${rows.length} rows for ${ref.size} keys")
      val got = rows.map(r => (r._1, r._2) -> r._3).toMap
      assert(got == ref.toMap, s"round $round diverged")
    }
  }
}
