package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the quantile machinery (r13) — not part of
  * the driver contract; safe to delete.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/sf1")
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    t("plain scan+agg")(spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(sum("l_extendedprice")).collect())
    t("plain scan+agg 2")(spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(sum("l_extendedprice")).collect())
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    for (round <- 1 to 2) {
      val base = t(s"r$round projected persist")(
        graft.operators.Quantiles.prepared(li, "l_extendedprice"))
      t(s"r$round materialize cache")(base.count())
      t(s"r$round exactQuantiles 2job")(
        graft.operators.Winsorize.exactQuantiles(base, Seq(0.5)))
      t(s"r$round exactQ again")(
        graft.operators.Winsorize.exactQuantiles(base, Seq(0.5)))
      t(s"r$round percentilesPrepared")(
        graft.operators.Quantiles.percentilesPrepared(base, Seq(0.5)))
      t(s"r$round unpersist")(base.unpersist(blocking = true))
    }
    // no persist at all
    val proj = graft.operators.Quantiles.projected(li, "l_extendedprice")
    t("nocache exactQuantiles")(
      graft.operators.Winsorize.exactQuantiles(proj, Seq(0.5)))
    t("nocache exactQuantiles 2")(
      graft.operators.Winsorize.exactQuantiles(proj, Seq(0.5)))
    // mimic Bench's inter-run cleanup: does gc/clearCache inflate reruns?
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    for (i <- 1 to 3) {
      clear()
      t(s"postclear exactQuantiles $i")(
        graft.operators.Winsorize.exactQuantiles(proj, Seq(0.5)))
    }
    for (i <- 1 to 2) {
      clear()
      t(s"postclear medianAndMad $i")(graft.operators.Winsorize
        .medianAndMad(proj, graft.operators.Quantiles.round6))
    }
    // winsorize whole-op, both arms (env flip), twice each for warm state
    for (i <- 1 to 3)
      t(s"winsorizedStats $i")(graft.operators.Winsorize
        .winsorizedStats(spark, li, "l_extendedprice", 0.01, 0.99).collect())
    // dissect: histogram pass vs decimal region pass on the a11 leaves
    locally {
      import graft.operators.Winsorize
      val raw = t("w dissect hist")(Winsorize.bucketHistogram(proj, true))
      val buckets = Winsorize.mergedBuckets(raw)
      val n = buckets.map(_.cnt).sum
      val cum = buckets.scanLeft(0L)(_ + _.cnt)
      val l1 = Winsorize.leafInterval(0.01, buckets, cum, n)
      val l2 = Winsorize.leafInterval(0.99, buckets, cum, n)
      println(s"[probe] leaf pops: ${l1._3} ${l2._3}")
      val leaves = Seq((l1._1, l1._2), (l2._1, l2._2))
      for (i <- 1 to 2)
        t(s"w dissect region sums $i")(
          Winsorize.regionScan(proj, leaves, true, needSums = true))
      t("w dissect region nosums")(
        Winsorize.regionScan(proj, leaves, true, needSums = false))
      t("w dissect region sums sql")(
        Winsorize.regionScan(proj, leaves, false, needSums = true))
    }
    // typed-arm JBD accumulation in isolation
    locally {
      import spark.implicits._
      import java.math.{BigDecimal => JBD, RoundingMode}
      for (i <- 1 to 2)
        t(s"typed JBD fold $i")(proj.as[Double].mapPartitions { it =>
          var s = JBD.ZERO
          it.foreach(v =>
            s = s.add(JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP)))
          Iterator.single(s.toPlainString)
        }.collect())
      for (i <- 1 to 2)
        t(s"typed plain fold $i")(proj.as[Double].mapPartitions { it =>
          var s = 0.0
          it.foreach(v => s += v)
          Iterator.single(s)
        }.collect())
    }
    // sc6 variants: pruned from_json vs get_json_object
    locally {
      import org.apache.spark.sql.types._
      val ev = Tables.events(spark, dir)
      for (i <- 1 to 2) {
        t(s"sc6 from_json pruned $i")(ev.withColumn("j",
            from_json(col("props"), StructType(Seq(
              StructField("k", IntegerType)))))
          .select(col("event_id"), col("j.k").as("k"))
          .write.format("noop").mode("overwrite").save())
        t(s"sc6 get_json_object $i")(ev.select(col("event_id"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
          .write.format("noop").mode("overwrite").save())
        t(s"sc6 baseline noop $i")(ev.select(col("event_id"))
          .write.format("noop").mode("overwrite").save())
      }
      println("[probe] props sample: " + ev.select("props").head().getString(0))
    }
    // decimal-sum cost in isolation: SQL decimal agg vs long-cents agg
    t("sql decimal(28,6) sum")(li.agg(
      sum(col("l_extendedprice").cast(org.apache.spark.sql.types
        .DecimalType(28, 6)))).collect())
    t("sql decimal(18,6) sum")(li.agg(
      sum(col("l_extendedprice").cast(org.apache.spark.sql.types
        .DecimalType(18, 6)))).collect())
    t("sql long micros sum")(li.agg(
      sum((col("l_extendedprice") * 1e6).cast(
        org.apache.spark.sql.types.LongType))).collect())
    spark.stop()
  }
}
