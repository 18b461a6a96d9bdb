package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k (the registered `llm_cosine_topk` oracle query)
  * is the correctness baseline; this module adds the scale path: random-
  * hyperplane LSH bucketing so candidate generation is a shuffle on bucket
  * signature instead of an n×m cross join. At 100 TB the cross join is the
  * plan-killer; with b sign-bits the candidate set shrinks ~2^b-fold while
  * recall is recovered by probing nBits rotations (multi-probe).
  *
  * Hyperplanes are deterministic pseudo-random (seeded hash of (plane,dim))
  * — no driver-side randomness, identical across runs and engines.
  */
object Similarity {

  /** Deterministic hyperplane coefficient in ~[-7.5, 7.5]: md5-derived. */
  private def planeCoef(salt: Int, plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$salt:$plane:$dim".getBytes("UTF-8"))
    ((h(0) & 0xff) - 127.5) / 17.0
  }

  /** Column expression: sign-bit signature of `vecCol` under `nBits`
    * deterministic hyperplanes, as a string like "0110...". `salt` selects
    * an independent hyperplane family (one per hash table).
    */
  def lshSignature(spark: SparkSession, vecCol: String, dims: Int,
      nBits: Int, salt: Int = 0): org.apache.spark.sql.Column = {
    val bits = (0 until nBits).map { p =>
      val terms = (0 until dims).map { i =>
        s"element_at($vecCol, ${i + 1}) * ${planeCoef(salt, p, i)}"
      }.mkString(" + ")
      s"CASE WHEN ($terms) >= 0 THEN '1' ELSE '0' END"
    }
    expr(s"concat(${bits.mkString(", ")})")
  }

  /** Bucketed ANN: `nTables` independent LSH tables (classic OR-
    * amplification — a pair is a candidate if it collides in ANY table),
    * exact cosine on the deduplicated candidates, top-k per query.
    * Candidates come from a hash shuffle on (table-prefixed) bucket —
    * never an all-pairs cross join.
    */
  def annTopK(embeddings: DataFrame, queryPred: org.apache.spark.sql.Column,
      dims: Int = 64, nBits: Int = 8, nTables: Int = 3, k: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    val e = embeddings.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))"))
    val buckets = array((0 until nTables).map(t =>
      concat(lit(s"$t:"), lshSignature(spark, "v", dims, nBits, t))): _*)
    val eb = e.withColumn("bucket", explode(buckets))
    val q = eb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))
    val c = eb.select(col("vec_id").as("cid"), col("v").as("cv"),
      col("nrm").as("cn"), col("bucket"))
    val cand = q.join(c, Seq("bucket")) // shuffle on bucket, not cross join
      .filter(col("qid") =!= col("cid"))
      .drop("bucket")
      .dropDuplicates("qid", "cid") // pairs colliding in several tables
    val scored = cand
      .withColumn("dot",
        expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
      .withColumn("cos", col("dot") / (col("qn") * col("cn")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "cid", "cos", "rn")
  }

  /** Exact brute-force cosine top-k — the recall oracle for annTopK. */
  def bruteForceTopK(embeddings: DataFrame,
      queryPred: org.apache.spark.sql.Column, k: Int = 5): DataFrame = {
    val e = embeddings.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))"))
    val q = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("cid"), col("v").as("cv"),
      col("nrm").as("cn"))
    val scored = q.join(c, col("qid") =!= col("cid"))
      .withColumn("dot",
        expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
      .withColumn("cos", col("dot") / (col("qn") * col("cn")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "cid", "cos", "rn")
  }
}
