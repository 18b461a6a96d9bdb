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

  /** Replication guard: an interval may explode to at most this many
    * buckets (well under sequence()'s array-size ceiling).
    */
  val MaxBucketsPerInterval = 100000L

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
    // Fail loudly on bad interval data: an inverted interval would make
    // sequence() infer a NEGATIVE step and silently explode a descending
    // garbage bucket list that only dies at the final range filter, and a
    // pathologically long interval with a small bucketSeconds would exceed
    // sequence's array-length limit deep inside a shuffle.
    val checkedStart = when(col(startCol) <= col(endCol), col(startCol))
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: inverted interval $startCol > $endCol at $startCol="),
        col(startCol).cast("string"))))
    val checkedEnd = when(
        bucket(col(endCol)) - bucket(col(startCol)) <= MaxBucketsPerInterval,
        col(endCol))
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: interval spans >$MaxBucketsPerInterval buckets at " +
          s"$startCol="),
        col(startCol).cast("string"), lit(" - raise bucketSeconds"))))
    // NULL interval bounds are dropped, not raised: a NULL bound can never
    // satisfy the final ts>=start && ts<=end predicate, so dropping the row
    // up front preserves the join's semantics exactly (pre-guard behavior:
    // sequence() returned NULL and explode() discarded the row). Without
    // this filter the inverted-interval when() would evaluate to NULL, fall
    // to otherwise(), and crash the whole job with a misleading message.
    val ib = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn("__b",
        explode(sequence(bucket(checkedStart), bucket(checkedEnd))))
    fb.join(ib, Seq(key, "__b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__b")
  }
}
