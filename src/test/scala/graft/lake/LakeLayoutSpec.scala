package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The physical-layout contract, and the silent-corruption regression that
  * forced it (round 12): Spark's vectorized parquet reader TEARS ROWS on
  * data-page-V2 files when column-index filtering prunes to row ranges
  * whose starts land mid-page in a non-filter column — the filter columns
  * decode from the right offset, the others mis-skip, and row N's keys come
  * back paired with row N±k's payload. First seen as a flaky hash mismatch
  * on o6_zorder_scan_e2e at sf1 (page boundaries depend on range-partitioner
  * samples, so only some write geometries trigger it); made deterministic
  * here by forcing MISALIGNED page boundaries across columns: a 2 KiB page
  * budget caps the BIGINT column at ~250 rows/page while the row-count
  * limit caps the INT columns at 333, so box-filter row ranges start
  * mid-page in the BIGINT column. Experiment matrix from the incident:
  * torn with zstd, snappy AND uncompressed V2; clean with the row-by-row
  * reader, with columnindex filtering off, and with V1 pages under the
  * identical geometry. Hence Lake.layout writes V1 — asserted structurally
  * below via footers, and behaviorally via the adversarial round trip.
  */
class LakeLayoutSpec extends SparkSpec {

  // z-order-shaped fixture: derived filter dims so every row is
  // self-describing — a torn read is detectable from the row alone
  private def fixture(n: Long): DataFrame = spark.range(0, n).select(
    col("id").as("k"),
    pmod(col("id"), lit(251)).cast(IntegerType).as("x"),
    pmod(col("id") * 7919, lit(241)).cast(IntegerType).as("y"),
    (pmod(col("id"), lit(99999)) / 100.0).as("p"))

  /** Morton-ish layout (the o6 write shape) without going through Lake, so
    * the V2 arm can reproduce the OLD layout verbatim.
    */
  private def zsorted(df: DataFrame): DataFrame = {
    val mm = df.crossJoin(broadcast(df.agg(
        min(col("x").cast("double")).as("mnx"), max(col("x").cast("double")).as("mxx"),
        min(col("y").cast("double")).as("mny"), max(col("y").cast("double")).as("mxy"))))
      .withColumn("zx", floor((col("x") - col("mnx")) / (col("mxx") - col("mnx")) * 2047).cast("long"))
      .withColumn("zy", floor((col("y") - col("mny")) / (col("mxy") - col("mny")) * 2047).cast("long"))
    mm.withColumn("z", (0 until 11).flatMap(j => Seq(
        shiftleft(shiftright(col("zx"), j).bitwiseAND(lit(1L)), j * 2),
        shiftleft(shiftright(col("zy"), j).bitwiseAND(lit(1L)), j * 2 + 1))).reduce(_ bitwiseOR _))
      .drop("mnx", "mxx", "mny", "mxy", "zx", "zy")
      .repartitionByRange(8, col("z")).sortWithinPartitions("z").drop("z")
  }

  /** Torn rows across a sweep of box-filtered reads, as ONE union job: each
    * branch is its own parquet scan, so column-index pruning applies per
    * box exactly as a user query would see it.
    */
  private def tornRows(path: String): Long = {
    val full = spark.read.parquet(path)
    val boxes = for (x0 <- 0 to 210 by 15; y0 <- 0 to 200 by 15) yield
      full.filter(col("x").between(x0, x0 + 40) && col("y").between(y0, y0 + 40))
    boxes.reduce(_ unionAll _)
      .filter(col("x") =!= pmod(col("k"), lit(251)).cast(IntegerType) ||
              col("y") =!= pmod(col("k") * 7919, lit(241)).cast(IntegerType))
      .count()
  }

  private def writeGeometry(df: DataFrame, path: String, version: String): Unit =
    zsorted(df).write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.block.size", 16L * 1024 * 1024)
      .option("parquet.writer.version", version)
      .option("parquet.page.size", 2048)            // BIGINT pages ~250 rows
      .option("parquet.page.row.count.limit", 333)  // INT pages 333 rows
      .parquet(path)

  test("lake files carry no V2 page encodings (footer-level contract)") {
    val p = tmpDir() + "/layout"
    Lake.zorder(spark, fixture(50000), p, Seq("x", "y"), nFiles = 4)
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(p).listFiles.filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala).foreach { c =>
          assert(c.getCodec.name == "ZSTD", s"codec drifted: ${c.getCodec}")
          val enc = c.getEncodings.asScala.map(_.name).toSet
          // V2 pages encode ints as DELTA_BINARY_PACKED and strings as
          // DELTA_BYTE_ARRAY — their presence means the layout regressed
          assert(!enc.exists(_.startsWith("DELTA")),
            s"V2-page encodings in lake file ${f.getName}: $enc")
        }
      } finally reader.close()
    }
  }

  test("filtered reads stay row-consistent at the adversarial page geometry") {
    val v1 = tmpDir() + "/v1"
    writeGeometry(fixture(1500000), v1, "PARQUET_1_0")
    assert(tornRows(v1) == 0L, "V1 pages torn under column-index pruning")

    // canary, not an assertion: the V2 arm documents the upstream bug this
    // spec guards against. If Spark fixes the vectorized V2 skip path this
    // stops tearing — that must NOT fail the build, it just means the
    // V1 constraint could some day be revisited.
    val v2 = tmpDir() + "/v2"
    writeGeometry(fixture(1500000), v2, "PARQUET_2_0")
    val torn = tornRows(v2)
    if (torn == 0L)
      info("V2 canary no longer tears — upstream skip path may be fixed")
    else
      info(s"V2 canary torn rows: $torn (bug still present; V1 stays mandatory)")
  }
}
