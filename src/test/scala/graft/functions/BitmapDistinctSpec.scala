package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the paged-bitmap exact-distinct aggregate
  * (bitmap_distinct): agreement with count(DISTINCT) under many
  * partitions (partial + merge + wire serde on every path), page-boundary
  * keys, negative keys (arithmetic-shift page indices), null inputs, and
  * a direct State-level check of the open-hash table growth + tail-page
  * truncation in the serialized form.
  */
class BitmapDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: Seq[(Int, Long)]): Seq[(Int, Long, Long)] =
    rows.toDF("g", "v")
      .repartition(8) // force partial states, serde and merge
      .groupBy("g")
      .agg(expr("bitmap_distinct(v)").as("bm"),
        countDistinct(col("v")).as("cd"))
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)

  test("matches count(DISTINCT) on dense, duplicated keys") {
    val rows = for (g <- 0 to 2; v <- 0L to 999L; _ <- 1 to 3)
      yield (g, v + g * 100) // overlapping dense ranges per group
    both(rows).foreach { case (_, bm, cd) => assert(bm == cd && bm == 1000L) }
  }

  test("page-boundary and negative keys count exactly once each") {
    // straddle the 4096-bit page edges, include negatives (page index
    // from an arithmetic shift) and Long extremes
    val vs = Seq(-1L, 0L, 1L, 4095L, 4096L, 4097L, -4095L, -4096L, -4097L,
      Long.MaxValue, Long.MinValue, Long.MaxValue - 1)
    val rows = (vs ++ vs ++ vs).map(v => (1, v))
    val Seq((_, bm, cd)) = both(rows)
    assert(bm == cd && bm == vs.length.toLong)
  }

  test("null inputs are ignored, matching COUNT(DISTINCT) semantics") {
    val got = Seq((1, Some(7L)), (1, None), (1, Some(8L)), (1, None))
      .toDF("g", "v")
      .groupBy("g").agg(expr("bitmap_distinct(v)").as("bm"))
      .as[(Int, Long)].collect().toMap
    assert(got(1) == 2L)
  }

  test("integer-typed keys are accepted; strings rejected at analysis") {
    val got = Seq((1, 5), (1, 5), (1, 6)).toDF("g", "v")
      .groupBy("g").agg(expr("bitmap_distinct(v)").as("bm"))
      .as[(Int, Long)].collect().toMap
    assert(got(1) == 2L)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, "x")).toDF("g", "v")
        .groupBy("g").agg(expr("bitmap_distinct(v)")).collect()
    }
    assert(err.getMessage.contains("bitmap_distinct"))
  }

  test("state: sparse far-apart pages, hash growth, serde round-trip") {
    val s = new BitmapDistinctLong.State()
    // 100 far-apart pages force several table growths
    val keys = (0 until 100).map(i => i.toLong * 1000000L - 50000000L)
    keys.foreach(s.add); keys.foreach(s.add)
    assert(s.cardinality() == 100L)
    val round = BitmapDistinctLong.State.fromBytes(s.toBytes)
    assert(round.cardinality() == 100L)
    // or() of disjoint and overlapping states
    val t = new BitmapDistinctLong.State()
    (0L to 63L).foreach(t.add)
    round.or(t)
    assert(round.cardinality() == 100L + 64L - keys.count(k => k >= 0 && k < 64))
  }

  test("wire form truncates empty tail words (dense prefix stays small)") {
    val s = new BitmapDistinctLong.State()
    s.add(0L) // one bit in word 0 of page 0
    val bytes = s.toBytes
    // 4 (count) + 8 (page idx) + 2 (word count) + 8 (one live word)
    assert(bytes.length == 22, s"expected 22 wire bytes, got ${bytes.length}")
  }
}
