package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-table access — SURVEY.md §2.1 S10 (utilidades/db_utils.py:52-166).
  *
  * The reference keeps config/dimension tables (mercados_mapping, up_listado,
  * tecnologias_generacion, up_uof_vinculacion) in MySQL. Spark equivalent:
  * `spark.read.jdbc` / `df.write.jdbc` against any JDBC database (DimsSpec
  * exercises the real JDBC arm against embedded Derby, which ships with
  * Spark), and a parquet dim store for environments without one — the call
  * shape is identical.
  *
  * The reference's row-UPDATE-by-key becomes a MERGE-style keep-last write:
  * union(current, updates) → row_number over key by precedence → overwrite.
  */
object Dims {

  /** S10 read — JDBC when a url is configured, parquet store otherwise. */
  def read(spark: SparkSession, table: String, jdbcUrl: Option[String],
      storePath: String): DataFrame = jdbcUrl match {
    case Some(url) => spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()
    case None => spark.read.parquet(s"$storePath/$table")
  }

  /** S10 write (full replace — dimension tables are small). */
  def write(df: DataFrame, table: String, jdbcUrl: Option[String],
      storePath: String): Unit = jdbcUrl match {
    case Some(url) => df.write.format("jdbc").mode(SaveMode.Overwrite)
      .option("url", url).option("dbtable", table).save()
    case None => df.write.mode(SaveMode.Overwrite)
      .parquet(s"$storePath/$table")
  }

  /** S10 update-by-key as a merge: rows in `updates` replace current rows
    * with the same key; everything else is kept.
    * ref: db_utils.py:133-166 (batch UPDATE by key columns)
    */
  def upsertByKey(spark: SparkSession, table: String, updates: DataFrame,
      keys: Seq[String], jdbcUrl: Option[String], storePath: String): DataFrame = {
    val current = read(spark, table, jdbcUrl, storePath)
    val merged = current.withColumn("__prec", lit(0))
      .unionByName(updates.withColumn("__prec", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__prec").desc)
    // materialize BEFORE the overwrite: the merge plan reads the very table
    // it is about to replace, and an Overwrite write truncates the target
    // before a lazy scan would execute (JDBC truncates eagerly; file
    // sources have the same read-what-you-overwrite hazard)
    val result = merged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__prec")
      .localCheckpoint()
    write(result, table, jdbcUrl, storePath)
    read(spark, table, jdbcUrl, storePath)
  }
}
