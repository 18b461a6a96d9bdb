package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation toolkit. AQE's skew-join splitting handles most cases at
  * runtime; these are the explicit tools for the pathologies AQE can't fix:
  * a single hot key inside an aggregation (one reducer gets the hot group
  * no matter how the partitions split) and a hot key joining a dim table.
  *
  * Salts derive from content hash + per-partition row position (never
  * rand()). Caveat, stated honestly: `monotonically_increasing_id` depends
  * on row order within a partition, so like every row-position scheme
  * (including Spark's own round-robin repartition, SPARK-23207) it is only
  * retry-stable when the input's partitioning and order are — reading from
  * files is fine; feeding it the raw output of a shuffle is not. For a
  * shuffled input, materialize first (localCheckpoint) or salt on a stable
  * key column.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates (keys + salt) — the
    * hot key's rows spread across `salts` reducers — phase 2 combines the
    * partials. Caller supplies algebraic partial/final pairs (sum/sum,
    * count→sum, min/min, max/max...).
    */
  /** Per-ROW salt. It must vary per row, not per value: a hot key whose
    * rows carry a constant value (repeated flags, zeros, nulls — the
    * typical skew pathology) would hash to a single salt and get zero
    * spread. See the object doc for the retry-stability caveat.
    */
  private[transform] def rowSalt(valueCol: String, salts: Int): Column =
    pmod(hash(col(valueCol), monotonically_increasing_id()), lit(salts))

  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int, out: String = "total"): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(valueCol, salts))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(out))
  }

  /** Salted fact×dim join for a skewed fact key: the fact side gets a
    * content-derived salt in [0, salts); the dim side is replicated ×salts
    * (explode of a literal range — dims are small by definition). The join
    * key becomes (key, salt), so the hot key's rows spread over `salts`
    * tasks instead of one.
    */
  def saltedDimJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(factKey), monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
          saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
