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

  /** The reference's three parameterized statement shapes
    * (db_utils.py:52-166), generated per JDBC dialect. MySQL backticks
    * everything. ANSI engines (Derby, Postgres, …) get the exact mix
    * Spark's own JDBC writer uses when it CREATEs the table — table name
    * UNQUOTED (case-folds with the catalog) but column names QUOTED
    * (the writer quotes them in DDL, making them case-sensitive); any
    * other mix misses one or the other, verified against embedded Derby.
    * Identifiers are validated, never interpolated raw — the reference
    * string-formats table/column names into SQL; here that surface is
    * closed.
    */
  object Sql {
    private def check(ident: String): String = {
      require(ident.matches("[A-Za-z0-9_]+"), s"unsafe SQL identifier: $ident")
      ident
    }
    private def qt(table: String, url: String): String =
      if (url.startsWith("jdbc:mysql")) s"`${check(table)}`" else check(table)
    private def qc(colName: String, url: String): String =
      if (url.startsWith("jdbc:mysql")) s"`${check(colName)}`"
      else "\"" + check(colName) + "\""

    /** SELECT cols FROM table [WHERE ...] (db_utils.py:52-85). */
    def select(table: String, columns: Seq[String], where: Option[String],
        url: String): String = {
      val cols = if (columns.isEmpty) "*"
                 else columns.map(qc(_, url)).mkString(", ")
      s"SELECT $cols FROM ${qt(table, url)}" +
        where.map(w => s" WHERE $w").getOrElse("")
    }

    /** INSERT INTO table (cols) VALUES (?, …) (db_utils.py:87-131). */
    def insert(table: String, columns: Seq[String], url: String): String =
      s"INSERT INTO ${qt(table, url)} " +
        columns.map(qc(_, url)).mkString("(", ", ", ")") +
        s" VALUES ${columns.map(_ => "?").mkString("(", ", ", ")")}"

    /** UPDATE table SET c=? … WHERE k=? … (db_utils.py:133-166). */
    def update(table: String, setCols: Seq[String], keyCols: Seq[String],
        url: String): String = {
      require(setCols.nonEmpty && keyCols.nonEmpty,
        "update needs at least one SET and one key column")
      s"UPDATE ${qt(table, url)} SET " +
        setCols.map(c => s"${qc(c, url)} = ?").mkString(", ") +
        " WHERE " + keyCols.map(c => s"${qc(c, url)} = ?").mkString(" AND ")
    }
  }

  /** The reference's literal update path — batch UPDATE by key columns
    * (db_utils.py:133-166) — executed for real over JDBC: each partition
    * opens one connection and flushes PreparedStatement batches of
    * `batchSize`, so a large update set streams through executors without
    * any driver-side collection. Rows whose key matches nothing are
    * silently no-ops, exactly like an UPDATE. For the merge-style
    * alternative that also INSERTS new keys, see [[upsertByKey]].
    */
  def updateByKeyJdbc(updates: DataFrame, table: String, keys: Seq[String],
      url: String, batchSize: Int = 1000): Unit = {
    val cols = updates.columns.toSeq
    val setCols = cols.filterNot(keys.contains)
    val sql = Sql.update(table, setCols, keys, url)
    val paramCols = setCols ++ keys // statement parameter order
    val idx = paramCols.map(cols.indexOf)
    updates.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            idx.zipWithIndex.foreach { case (ci, pi) =>
              st.setObject(pi + 1, r.get(ci))
            }
            st.addBatch()
            n += 1
            if (n % batchSize == 0) st.executeBatch()
          }
          st.executeBatch()
          st.close()
        } finally conn.close()
      }
    }
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
