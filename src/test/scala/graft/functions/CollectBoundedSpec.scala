package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the bounded-state distinct-collect aggregate
  * (collect_bounded): saturation → NULL, duplicate folding, null inputs,
  * deterministic ascending output, and partial/merge correctness across
  * many partitions (the map-side-combine path the 100 TB argument rests
  * on).
  */
class CollectBoundedSpec extends SparkSpec {
  import spark.implicits._

  private def collected(rows: Seq[(Long, Long)], limit: Int) =
    rows.toDF("k", "v")
      .repartition(8) // force partial states + merge
      .groupBy("k")
      .agg(expr(s"collect_bounded(v, $limit)").as("s"))
      .as[(Long, Option[Seq[Long]])]
      .collect().toMap

  test("exact sets below the limit, NULL at limit+1 distinct") {
    val rows = Seq(
      1L -> 10L, 1L -> 11L,                       // 2 distinct ⇒ kept
      2L -> 20L, 2L -> 21L, 2L -> 22L, 2L -> 23L, // 4 distinct ⇒ kept
      3L -> 30L, 3L -> 31L, 3L -> 32L, 3L -> 33L, 3L -> 34L, // 5 ⇒ null
      4L -> 40L                                   // 1 distinct ⇒ kept
    )
    val got = collected(rows, 4)
    assert(got(1L).contains(Seq(10L, 11L)))
    assert(got(2L).contains(Seq(20L, 21L, 22L, 23L)))
    assert(got(3L).isEmpty, "overflowed group must yield NULL")
    assert(got(4L).contains(Seq(40L)))
  }

  test("duplicates fold before the bound counts them") {
    // 12 instances, 3 distinct values — far over the row count, under the
    // distinct bound
    val rows = (0 until 12).map(i => 1L -> (i % 3).toLong)
    assert(collected(rows, 4)(1L).contains(Seq(0L, 1L, 2L)))
  }

  test("output is ascending regardless of input / partition order") {
    val rows = Seq(1L -> 9L, 1L -> 1L, 1L -> 5L, 1L -> 3L)
    assert(collected(rows, 8)(1L).contains(Seq(1L, 3L, 5L, 9L)))
  }

  test("null inputs are ignored, not collected") {
    val got = Seq((1L, Some(7L)), (1L, None), (1L, Some(8L)))
      .toDF("k", "v")
      .groupBy("k").agg(expr("collect_bounded(v, 4)").as("s"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(got(1L).contains(Seq(7L, 8L)))
  }

  test("saturation survives merge: many partitions, one hot key") {
    // 1000 distinct values for one key spread over many partitions: every
    // partial saturates or stays small; the merged result must be NULL,
    // and the buffer never holds more than limit+1 values by construction
    val rows = (0 until 1000).map(i => 1L -> i.toLong)
    assert(collected(rows, 4)(1L).isEmpty)
  }
}
