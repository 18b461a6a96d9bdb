package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("S3 melt: wide hourly sheet → long (hora, volumenes), nulls dropped") {
    val wide = Seq(
      ("UP1", "2024-01-01", Some(1.5), Some(2.5), None),
      ("UP2", "2024-01-01", None, Some(4.0), Some(5.0)))
      .toDF("up", "fecha", "1", "2", "3")
    val long = Ingest.melt(wide, Seq("up", "fecha"), Seq("1", "2", "3"))
    assert(long.count() == 4) // 6 cells − 2 nulls
    val r = long.filter(col("up") === "UP1" && col("hora") === "2")
      .select("volumenes").as[Double].head()
    assert(r == 2.5)
    assert(long.columns.sameElements(Array("up", "fecha", "hora", "volumenes")))
  }

  test("F11 zero pruning after melt") {
    val df = Seq(("a", 0.0), ("b", 1.0)).toDF("k", "volumenes")
    assert(Ingest.pruneZeroValues(df).select("k").as[String].collect()
      .sameElements(Array("b")))
  }

  test("SC1 European decimal parse") {
    val out = Seq("1.234,56", "12,5", "1.000.000,00").toDF("s")
      .select(Ingest.parseEuropeanDecimal(col("s"))).as[Double].collect()
    assert(out.sameElements(Array(1234.56, 12.5, 1000000.0)))
  }

  test("S4 OMIE CSV dialect: ';' sep, latin-1, 2-line preamble skipped") {
    val dir = tmpDir()
    val content = "OMIE - preamble title;;;\n\nUP1;Venta;1.234,56\nUP2;Compra;7,5\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/day1.csv"),
      content.getBytes("ISO-8859-1"))
    val schema = StructType(Seq(
      StructField("unidad", StringType), StructField("tipo", StringType),
      StructField("energia", StringType)))
    val df = Ingest.readOmieCsv(spark, s"$dir/day1.csv", schema, skipLines = 2)
      .withColumn("energia", Ingest.parseEuropeanDecimal(col("energia")))
    val rows = df.orderBy("unidad").as[(String, String, Double)].collect()
    assert(rows.sameElements(Array(("UP1", "Venta", 1234.56), ("UP2", "Compra", 7.5))))
  }

  test("S2 zipped source: real zip, entry filter, preamble skip, schema'd rows") {
    val dir = tmpDir()
    def zipWith(path: String, entries: (String, String)*): Unit = {
      val zos = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(path))
      entries.foreach { case (name, content) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(content.getBytes("ISO-8859-1"))
        zos.closeEntry()
      }
      zos.close()
    }
    // two daily archives; each holds a matching sheet file + noise entries
    zipWith(s"$dir/I90DIA_20240701.zip",
      "I90DIA03.csv" -> "titulo;;\nfecha;;\nUP1;Subir;10,5\nUP2;Bajar;3,0\n",
      "leeme.txt" -> "not;a;sheet")
    zipWith(s"$dir/I90DIA_20240702.zip",
      "I90DIA03.csv" -> "titulo;;\nfecha;;\nUP3;Subir;7,25\n",
      "I90DIA99.csv" -> "x;y;z\nq;w;e\nshould;not;appear")
    val schema = StructType(Seq(
      StructField("up", StringType), StructField("sentido", StringType),
      StructField("energia", StringType)))
    val df = Ingest.readZippedCsv(spark, dir, "I90DIA03", schema, skipLines = 2)
      .withColumn("energia", Ingest.parseEuropeanDecimal(col("energia")))
    val rows = df.orderBy("up").as[(String, String, Double)].collect()
    assert(rows.sameElements(Array(
      ("UP1", "Subir", 10.5), ("UP2", "Bajar", 3.0), ("UP3", "Subir", 7.25))))
  }

  /** A minimal REAL xlsx: zip of OOXML parts — workbook + rels + shared
    * strings (incl. a rich-text run) + two sheets exercising shared,
    * inline-string, numeric and sparse cells.
    */
  private def xlsxBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    val mainNs = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val rNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?>
         |<workbook xmlns="$mainNs" xmlns:r="$rNs"><sheets>
         |<sheet name="I90DIA01" sheetId="1" r:id="rId1"/>
         |<sheet name="Resumen" sheetId="2" r:id="rId2"/>
         |</sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    // si[0] plain, si[1] rich-text runs concatenating to "Unidad de Programación"
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst><si><t>UP7</t></si>
        |<si><r><t>Unidad de </t></r><r><t>Programación</t></r></si></sst>"""
        .stripMargin)
    // header row + 2 data rows; row 3 leaves B empty (sparse C-only cell)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>1</v></c>
        |  <c r="B1" t="inlineStr"><is><t>00-01</t></is></c>
        |  <c r="C1" t="inlineStr"><is><t>01-02</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2"><v>42.5</v></c>
        |  <c r="C2"><v>7</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>UP9</t></is></c>
        |  <c r="C3"><v>3.25</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    put("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>nope</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    bos.toByteArray
  }

  test("S2 xlsx codec: real workbook, sheet filter, shared/inline/sparse cells") {
    val dir = tmpDir()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/I90DIA_20240101.xlsx"), xlsxBytes)
    val df = Ingest.readXlsx(spark, dir, "^I90DIA")
    val rows = df.orderBy("row_idx")
      .as[(String, Int, Seq[String])].collect()
    assert(rows.map(_._1).forall(_ == "I90DIA01")) // Resumen filtered out
    assert(rows(0) == (("I90DIA01", 0,
      Seq("Unidad de Programación", "00-01", "01-02"))))
    assert(rows(1) == (("I90DIA01", 1, Seq("UP7", "42.5", "7"))))
    assert(rows(2) == (("I90DIA01", 2, Seq("UP9", "", "3.25")))) // B3 padded
  }

  test("sheetToWide guards: missing/blank/duplicate headers fail with context") {
    import spark.implicits._
    // header row index beyond the sheet → clear error, not NoSuchElement
    val twoRows = Seq(("S", 0, Seq("a", "b")), ("S", 1, Seq("1", "2")))
      .toDF("sheet", "row_idx", "cells")
    val eMissing = intercept[IllegalArgumentException] {
      Ingest.sheetToWide(twoRows, headerRowIdx = 5)
    }
    assert(eMissing.getMessage.contains("no header row at row_idx=5"))
    // blank header cell → rejected, naming the position
    val blank = Seq(("S", 0, Seq("a", " ")), ("S", 1, Seq("1", "2")))
      .toDF("sheet", "row_idx", "cells")
    val eBlank = intercept[IllegalArgumentException] {
      Ingest.sheetToWide(blank, headerRowIdx = 0)
    }
    assert(eBlank.getMessage.contains("blank header cell at position 1"))
    // duplicate header name → rejected (ambiguous col() downstream)
    val dup = Seq(("S", 0, Seq("a", "a")), ("S", 1, Seq("1", "2")))
      .toDF("sheet", "row_idx", "cells")
    val eDup = intercept[IllegalArgumentException] {
      Ingest.sheetToWide(dup, headerRowIdx = 0)
    }
    assert(eDup.getMessage.contains("duplicate header name 'a'"))
  }

  test("S2 zipped xlsx → dynamic header → melt: the reference's I90 flow") {
    val dir = tmpDir()
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/I90DIA_20240101.zip"))
    zos.putNextEntry(new java.util.zip.ZipEntry("I90DIA_20240101.xls"))
    zos.write(xlsxBytes); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("leeme.txt"))
    zos.write("noise".getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    val sheets = Ingest.readZippedXlsx(spark, dir, "\\.xls$", "^I90DIA")
    val wide = Ingest.sheetToWide(sheets, headerRowIdx = 0)
    assert(wide.columns.sameElements(
      Array("Unidad de Programación", "00-01", "01-02")))
    // try_cast: padded blank cells must become NULL (for melt's dropna),
    // not an ANSI cast error
    val long = Ingest.melt(
      wide.withColumn("00-01", expr("try_cast(`00-01` AS DOUBLE)"))
        .withColumn("01-02", expr("try_cast(`01-02` AS DOUBLE)")),
      Seq("Unidad de Programación"), Seq("00-01", "01-02"))
    val got = long.orderBy("Unidad de Programación", "hora")
      .as[(String, String, Double)].collect()
    assert(got.sameElements(Array(
      ("UP7", "00-01", 42.5), ("UP7", "01-02", 7.0), ("UP9", "01-02", 3.25))))
  }
}
