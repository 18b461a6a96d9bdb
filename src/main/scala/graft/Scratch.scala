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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val MinhashP = 2147483647L
    val MinhashA = Seq(1103515245L, 1232937849L, 1654435769L,
      999999937L, 1779033703L, 1013904223L, 1847062237L, 2038074743L,
      1294967291L, 1431655751L, 1540483477L, 2091639091L)
    val MinhashC = Seq(12345L, 362437L, 521288629L, 668265263L,
      374761393L, 951274213L, 777767777L, 303700049L, 1111111111L,
      99990001L, 613651349L, 1500450271L)

    val mins = MinhashA.zip(MinhashC).zipWithIndex.map { case ((a, c), j) =>
      min(expr(s"(${a}L * shiftright(x, 32) + ${c}L) % ${MinhashP}L"))
        .as(s"mh$j")
    }
    // current: interpreted transform -> explode
    def baseA = documents(spark, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .filter(size(col("l")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(l) - 2),
             i -> concat_ws(' ', element_at(l, i), element_at(l, i + 1),
                            element_at(l, i + 2)))""")).as("t"))
      .select(col("doc_id"),
        expr("CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT)").as("x"))
    // candidate: fully codegen (explode index, inline shingle build)
    def baseB = documents(spark, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .filter(size(col("l")) >= 3)
      .select(col("doc_id"), col("l"),
        explode(expr("sequence(1, size(l) - 2)")).as("i"))
      .select(col("doc_id"),
        expr("""CAST(conv(substr(md5(concat_ws(' ', element_at(l, i),
                element_at(l, i + 1), element_at(l, i + 2))), 1, 15), 16, 10)
                AS BIGINT)""").as("x"))
    def profOf(b: => org.apache.spark.sql.DataFrame) = b.groupBy("doc_id")
      .agg(collect_set(col("x")).as("hs"), mins: _*)
      .select(col("doc_id"), col("hs"), size(col("hs")).as("c"),
        array(MinhashA.indices.map(j => col(s"mh$j")): _*).as("mhs"))
    val affCols = MinhashA.zip(MinhashC).zipWithIndex.map { case ((a, c), j) =>
      expr(s"(${a}L * shiftright(x, 32) + ${c}L) % ${MinhashP}L").as(s"a$j")
    }
    def profPreOf(b: => org.apache.spark.sql.DataFrame) = b
      .select((col("doc_id") +: col("x").as("x") +: affCols): _*)
      .groupBy("doc_id")
      .agg(collect_set(col("x")).as("hs"),
        MinhashA.indices.map(j => min(col(s"a$j")).as(s"mh$j")): _*)
      .select(col("doc_id"), col("hs"), size(col("hs")).as("c"),
        array(MinhashA.indices.map(j => col(s"mh$j")): _*).as("mhs"))

    def timeCk(n: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val x = df.localCheckpoint(); x.unpersist(blocking = false)
      (System.nanoTime() - t0) / 1e9
    }
    // warm everything once
    timeCk("w") { profOf(baseA) }; timeCk("w") { profOf(baseB) }
    timeCk("w") { profPreOf(baseB) }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
    timeCk("w") { profPreOf(baseB) }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    // interleaved measurement
    val res = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to 5).foreach { _ =>
      res("A-full") ::= timeCk("")(profOf(baseA))
      res("B-full") ::= timeCk("")(profOf(baseB))
      res("B-pre") ::= timeCk("")(profPreOf(baseB))
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      res("B-pre-hi") ::= timeCk("")(profPreOf(baseB))
      res("B-full-hi") ::= timeCk("")(profOf(baseB))
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    }
    def profBareOf(b: => org.apache.spark.sql.DataFrame) = b.groupBy("doc_id")
      .agg(collect_set(col("x")).as("hs"))
      .select(col("doc_id"), col("hs"), size(col("hs")).as("c"))
    timeCk("w") { profBareOf(baseB) }
    (1 to 5).foreach { _ =>
      res("B-bare") ::= timeCk("")(profBareOf(baseB))
      res("B-full2") ::= timeCk("")(profOf(baseB))
    }
    res.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"$k%-10s min=${v.min}%6.2f med=${v.sorted.apply(v.size / 2)}%6.2f")
    }
    spark.stop()
  }
}
