package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to every fact row the most recent quote row (per
  * key) whose timestamp is at or before the fact's — the classic
  * market-data operator Spark has no built-in for (DuckDB: `ASOF JOIN`;
  * pandas: `merge_asof`).
  *
  * Spark-first composition, per the preference order (compose built-ins
  * before custom plans): tag both sides, align schemas with
  * `unionByName(allowMissingColumns)`, and forward-fill the latest quote
  * ROW — carried as one struct, so `last(ignoreNulls)` picks whole rows
  * atomically: a matched quote's NULL field stays NULL (exactly DuckDB
  * ASOF / pandas merge_asof semantics) and values from different quote
  * rows are never stitched together. Quotes sort before facts at equal
  * timestamps, so an exact-timestamp quote applies to the fact (`<=`
  * semantics, matching DuckDB's `ON fact.ts >= quote.ts`).
  *
  * Cost shape: ONE hash shuffle on the key + a per-partition sort — the
  * same as the sort-merge join a dedicated physical operator would do, so
  * there is nothing for a custom `SparkPlan` to win at scale. Facts with
  * no prior quote keep NULL quote columns (left semantics).
  */
object AsOfJoin {

  def asOf(facts: DataFrame, quotes: DataFrame, key: String, ts: String,
      quoteCols: Seq[String]): DataFrame = {
    require(quoteCols.nonEmpty, "at least one quote column")
    require(quoteCols.forall(!facts.columns.contains(_)),
      s"quote columns ${quoteCols.filter(facts.columns.contains)} clash with fact columns")
    require(!facts.columns.contains("__side") && !facts.columns.contains("__q"),
      "fact columns __side/__q are reserved by asOf")
    val f = facts.withColumn("__side", lit(1))
    // the quote row travels as ONE non-null struct — the fill unit
    val q = quotes.select(col(key), col(ts),
        struct(quoteCols.map(col): _*).as("__q"))
      .withColumn("__side", lit(0))
    val u = f.unionByName(q, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("__q", last(col("__q"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(facts.columns.map(col) ++
        quoteCols.map(c => col(s"__q.$c").as(c)): _*)
  }
}
