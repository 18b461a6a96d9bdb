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
}
