package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lake.zorder: content round trip, the multi-dimensional pruning win over
  * a linear sort (the property the layout exists for), and the 1-D
  * degenerate case. File-level min/max overlap is the pruning proxy here —
  * it is exactly the statistic parquet row-group skipping consumes, checked
  * without depending on a specific reader's skipping implementation.
  */
class ZorderSpec extends SparkSpec {

  // 64k rows on a 256x256 grid; y is decorrelated from x by a coprime
  // multiplier so a linear x-sort carries no incidental y-clustering
  private def fixture = spark.range(0, 65536).select(
    (col("id") % 256).cast("int").as("x"),
    ((col("id") * 7919) % 256).cast("int").as("y"),
    col("id").as("v"))

  private def filesOf(path: String) =
    new java.io.File(path).listFiles.filter(_.getName.endsWith(".parquet")).toSeq

  /** (files whose [min,max] on `c` overlaps [lo,hi], total files). */
  private def overlapping(path: String, c: String, lo: Int, hi: Int): (Int, Int) = {
    val fs = filesOf(path)
    val n = fs.count { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(c)).as("mn"), max(col(c)).as("mx")).head
      r.getInt(1) >= lo && r.getInt(0) <= hi
    }
    (n, fs.size)
  }

  test("zorder round-trips content exactly") {
    val p = tmpDir() + "/z1"
    Lake.zorder(spark, fixture, p, Seq("x", "y"), nFiles = 16)
    val got = spark.read.parquet(p)
    assert(got.count() == 65536)
    assert(got.except(fixture).isEmpty && fixture.except(got).isEmpty)
  }

  test("zorder bounds secondary-dimension scans where a linear sort cannot") {
    val zp = tmpDir() + "/zz"
    val lp = tmpDir() + "/lin"
    Lake.zorder(spark, fixture, zp, Seq("x", "y"), nFiles = 16)
    // the linear rival: range-partitioned and sorted by x (then y)
    fixture.repartitionByRange(16, col("x")).sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(lp)
    // y-only box predicate: the x-sorted layout cannot prune at all (every
    // file spans the full y range); the z-layout confines the strip to the
    // quad-blocks it intersects
    val (zn, zt) = overlapping(zp, "y", 64, 95)
    val (ln, lt) = overlapping(lp, "y", 64, 95)
    assert(zt == 16 && lt == 16, s"unexpected file counts z=$zt lin=$lt")
    assert(ln == lt, "x-sorted layout unexpectedly pruned a y-only predicate")
    assert(zn <= zt / 2, s"z-order pruning too weak: $zn of $zt files overlap")
    // and the curve never changes WHAT the scan returns
    val q = (df: DataFrame) =>
      df.filter(col("y").between(64, 95)).select("x", "y", "v")
    assert(q(spark.read.parquet(zp)).except(q(spark.read.parquet(lp))).isEmpty)
    assert(q(spark.read.parquet(lp)).except(q(spark.read.parquet(zp))).isEmpty)
  }

  test("one-dimensional zorder degenerates to a non-overlapping range sort") {
    val p = tmpDir() + "/z1d"
    Lake.zorder(spark, fixture, p, Seq("x"), nFiles = 8)
    val ranges = filesOf(p).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("x")), max(col("x"))).head
      (r.getInt(0), r.getInt(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"file x-ranges overlap: $ranges")
      case _ => ()
    }
  }
}
