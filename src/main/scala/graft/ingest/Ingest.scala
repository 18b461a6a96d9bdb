package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source parsers — SURVEY.md §2.1 (S3, S4) and the European-decimal
  * scalar family (§2.8 SC1).
  */
object Ingest {

  /** S3 — wide hourly sheet → long table (the reference's pd.melt,
    * _descargador_i90.py:197-304): id columns stay, each hour column
    * becomes a (hora, value) row. Spark-native unpivot keeps this inside
    * codegen (no per-row logic), and value-null rows are dropped like the
    * reference's dropna.
    */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      varName: String = "hora", valName: String = "volumenes"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
        varName, valName)
      .filter(col(valName).isNotNull)

  /** F11 companion — drop NA/0 values post-melt (sparsity optimization,
    * _descargador_i90.py:286-292).
    */
  def pruneZeroValues(df: DataFrame, valName: String = "volumenes"): DataFrame =
    df.filter(col(valName).isNotNull && col(valName) =!= 0)

  /** SC1 — European decimal normalize: "1.234,56" → 1234.56.
    * ref: _procesador_omie.py:112-123, _descargador_omie.py:367-383
    */
  def parseEuropeanDecimal(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\.", ""), ",", ".").cast(DoubleType)

  /** S2 — zipped-workbook source: the reference downloads daily I90 zips,
    * extracts the workbook and filters sheets (_descargador_i90.py:77-196).
    * The ZIP layer here is real — `binaryFile` + the JDK inflater, one task
    * per archive, fully distributed across files — and entry filtering is
    * the sheet-filter analog. Only the Excel codec itself is out of scope
    * (no spreadsheet library in this environment), so fixtures carry CSV
    * payloads of identical structure inside real zip archives.
    */
  def readZippedCsv(spark: SparkSession, path: String, entryPattern: String,
      schema: StructType, skipLines: Int = 0,
      encoding: String = "ISO-8859-1", sep: String = ";"): DataFrame = {
    import spark.implicits._
    val lines: Dataset[String] = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        val re = entryPattern.r
        val zis = new java.util.zip.ZipInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var e = zis.getNextEntry
        while (e != null) {
          if (!e.isDirectory && re.findFirstIn(e.getName).isDefined) {
            val content = new String(zis.readAllBytes(), encoding)
            out ++= content.split("\r?\n").iterator
              .drop(skipLines).filter(_.trim.nonEmpty)
          }
          e = zis.getNextEntry
        }
        out.toSeq
      }
    spark.read.schema(schema).option("sep", sep).csv(lines)
  }

  /** S4 — OMIE CSV dialect scan: `;` separator, latin-1 encoding, two
    * header/preamble lines to skip, European decimals in value columns.
    * ref: _descargador_omie.py:207-330
    *
    * Spark's CSV reader has no per-file skip-rows option, so each file is
    * read whole (`wholetext` — the source CSVs are daily files of a few
    * hundred KB; one task per file, still fully distributed across files),
    * the preamble sliced off declaratively, and the body handed to the
    * schema'd CSV parser.
    */
  def readOmieCsv(spark: SparkSession, path: String, schema: StructType,
      skipLines: Int = 2): DataFrame = {
    import spark.implicits._
    val files = spark.read
      .option("wholetext", "true").option("encoding", "ISO-8859-1").text(path)
    val body: Dataset[String] = files
      .select(explode(slice(split(col("value"), "\r?\n"),
        skipLines + 1, Int.MaxValue)).as("line"))
      .filter(length(trim(col("line"))) > 0)
      .as[String]
    spark.read.schema(schema).option("sep", ";").csv(body)
  }
}
