package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** The r8 formulation this expression replaced: per-doc bigram explode,
    * broadcast model join, groupBy — the equivalence oracle for the
    * one-pass native scorer.
    */
  private def explodeJoinScore(texts: Seq[(Long, String)]) = {
    val docs = texts.toDF("doc_id", "text")
    val grams = docs
      .filter(length(col("text")) >= 2)
      .withColumn("cs", split(col("text"), "(?!^)"))
      .select(col("doc_id"),
        explode(expr("sequence(1, size(cs) - 2)")).as("i"), col("cs"))
      .select(col("doc_id"),
        expr("concat(element_at(cs, i), element_at(cs, i+1))").as("g"))
    val model = grams.groupBy("g").agg(count(lit(1)).as("n"))
      .withColumn("np",
        sum(col("n")).over(Window.partitionBy(substring(col("g"), 1, 1))))
      .select(col("g"), log(col("n").cast(DoubleType) / col("np")).as("lp"))
    val expected = grams.join(broadcast(model), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 6).as("lm_score_r"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    (docs, model, expected)
  }

  private def nativeScore(docs: org.apache.spark.sql.DataFrame,
      model: org.apache.spark.sql.DataFrame) = {
    val rows = model.collect()
    val ks = rows.map(r => BigramLm.packKey(r.getString(0)))
    val vs = rows.map(_.getDouble(1))
    docs.select(col("doc_id"),
        call_function("bigram_lm_stats", col("text"),
          typedlit(ks), typedlit(vs)).as("st"))
      .select(col("doc_id"), col("st.n_bigrams").as("n_bigrams"),
        when(col("st.n_bigrams") > 0,
          round(col("st.lp_sum") / col("st.n_bigrams"), 6)).as("lm_score_r"))
      .filter(col("n_bigrams") > 0)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
  }

  test("one-pass scorer matches the explode+join formulation, incl. unicode") {
    val texts = Seq(
      1L -> "the cat sat on the mat",
      2L -> "España año señal ñaña",   // non-ASCII code points
      3L -> "aaaaaaaa",                 // degenerate repeat
      4L -> "x",                        // single char → no bigram, dropped
      5L -> "the the the cat")
    val (docs, model, expected) = explodeJoinScore(texts)
    assert(nativeScore(docs, model).sameElements(expected))
    assert(!expected.exists(_._1 == 4L)) // both paths drop bigram-less docs
  }

  test("scorer skips bigrams absent from the model (partial-model inference)") {
    // train on doc 1 only, score doc 6 containing unseen bigrams — the
    // join formulation drops unseen grams from count and avg; so must we
    val (_, model, _) = explodeJoinScore(Seq(1L -> "abab"))
    val docs = Seq(6L -> "abxb").toDF("doc_id", "text") // "ab" known; "bx","xb" not
    val got = nativeScore(docs, model)
    assert(got.length == 1 && got.head._2 == 1L) // only "ab" matched
  }

  test("null text yields null struct, not a crash") {
    val docs = Seq((7L, Option.empty[String]), (8L, Some("ab")))
      .toDF("doc_id", "text")
    val (_, model, _) = explodeJoinScore(Seq(1L -> "ab"))
    val rows = model.collect()
    val ks = rows.map(r => BigramLm.packKey(r.getString(0)))
    val vs = rows.map(_.getDouble(1))
    val got = docs.select(col("doc_id"),
        call_function("bigram_lm_stats", col("text"),
          typedlit(ks), typedlit(vs)).as("st"))
      .select(col("doc_id"), col("st.n_bigrams"))
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got(0)._2.isEmpty && got(1)._2.contains(1L))
  }

  test("expression participates in whole-stage codegen") {
    // a parquet-backed scan, like VecDotSpec: a local Seq collapses to a
    // LocalTableScan that never enters a WholeStageCodegen stage
    val (_, model, _) = explodeJoinScore(Seq(1L -> "abcabc"))
    val rows = model.collect()
    val ks = rows.map(r => BigramLm.packKey(r.getString(0)))
    val vs = rows.map(_.getDouble(1))
    val plan = graft.Tables.documents(spark, sfDir)
      .select(call_function("bigram_lm_stats", col("text"),
        typedlit(ks), typedlit(vs)))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.toLowerCase.contains("bigramlmstats") && l.trim.startsWith("*(")), plan)
  }
}
