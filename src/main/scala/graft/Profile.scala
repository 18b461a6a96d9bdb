package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual registered queries (args = query names; no args
  * = all), printing per-query seconds after one warm-up pass of the scans.
  * Not part of the driver contract — Bench.scala is the measured artifact.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (explain) {
        println(s"===== $n =====")
        // formatted mode (guide §7.2): numbered operator list + per-node
        // details (PushedFilters, ReadSchema, join build side, exchange
        // partitioning) — the shape the plan artifacts under plans/ carry
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } else (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$n%-24s rep$r ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        // same per-rep hygiene as Bench: leaked caches AND localCheckpoint
        // blocks would otherwise accumulate across reps and skew timings
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
