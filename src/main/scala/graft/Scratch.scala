package graft

import graft.Tables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway dev probe — not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(n: String)(f: => Unit): Unit = (1 to 3).foreach { r =>
      val t0 = System.nanoTime(); f
      println(f"$n%-14s rep$r ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def shingleSets: org.apache.spark.sql.DataFrame =
      documents(spark, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 3)
        .select(col("doc_id"), expr(
          """array_distinct(transform(sequence(1, size(l) - 2),
               i -> concat_ws(' ', element_at(l, i), element_at(l, i + 1),
                              element_at(l, i + 2))))""").as("ss"))
        .withColumn("c", size(col("ss")))

    time("shingles") { noop(shingleSets) }
    time("checkpoint") { shingleSets.localCheckpoint().unpersist() }
    val ds = shingleSets.localCheckpoint()
    time("invidx") { noop(ds.select(col("doc_id"), explode(col("ss")).as("s"))
      .groupBy("s").agg(collect_set(col("doc_id")).as("dset"))
      .filter(size(col("dset")).between(2, 4))) }
    val n = documents(spark, d).count()
    println(s"docs=$n")
    spark.stop()
  }
}
