package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match every fact row to the
  * intervals (per key) that contain its timestamp. Spark plans the naive
  * `f.ts BETWEEN i.start AND i.end` predicate as a broadcast-nested-loop
  * join — quadratic in the non-equi dimension and the classic 100 TB
  * plan-killer.
  *
  * Scalable formulation: bin time into fixed-width buckets, explode each
  * interval to the buckets it covers, map each fact to its single bucket,
  * EQUI-join on (key, bucket), then apply the exact range predicate. A
  * fact's one bucket meets each covering interval exactly once, so no
  * dedup is needed. Cost: one hash shuffle on (key, bucket); bucket width
  * trades replication (long intervals explode to more buckets) against
  * join selectivity — pick it near the median interval length.
  */
object RangeJoin {

  def byContainment(facts: DataFrame, intervals: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bs = bucketSeconds * 1000000L // µs
    val fb = facts.withColumn("__b", expr(s"unix_micros($tsCol) div $bs"))
    val ib = intervals.withColumn("__b", explode(sequence(
      expr(s"unix_micros($startCol) div $bs"),
      expr(s"unix_micros($endCol) div $bs"))))
    fb.join(ib, Seq(key, "__b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__b")
  }
}
