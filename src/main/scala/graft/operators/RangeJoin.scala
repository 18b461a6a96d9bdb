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
    require(!facts.columns.contains("__b") && !intervals.columns.contains("__b"),
      "column __b is reserved by byContainment")
    val bs = lit(bucketSeconds * 1000000L) // µs
    // Column-API bucket index (no name interpolation into SQL text, so
    // names needing backquotes resolve like everywhere else); subtraction
    // of the remainder keeps the division an exact integer quotient
    def bucket(c: org.apache.spark.sql.Column) =
      ((unix_micros(c) - pmod(unix_micros(c), bs)) / bs).cast("long")
    val fb = facts.withColumn("__b", bucket(col(tsCol)))
    val ib = intervals.withColumn("__b", explode(sequence(
      bucket(col(startCol)), bucket(col(endCol)))))
    fb.join(ib, Seq(key, "__b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__b")
  }
}
