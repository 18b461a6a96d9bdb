package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the one-pass narrow-stats expressions
  * (char_entropy_stats, bigram_rep_stats) that the query-level hash gates
  * and CurationSpec hand-computations don't reach: empty inputs, unicode,
  * nulls, empty tokens from repeated delimiters, and scratch-table growth
  * past the initial capacity.
  */
class NarrowStatsSpec extends SparkSpec {
  import spark.implicits._

  test("char_entropy_stats: hand cases, unicode, empty, null") {
    val df = Seq(
      (1L, Some("aabb")),       // n=4, distinct=2, clogc=2·(2ln2)
      (2L, Some("ñña")),        // unicode code points: ñ×2, a×1
      (3L, Some("")),           // empty → n=0
      (4L, Option.empty[String]),
      (5L, Some("x"))
    ).toDF("id", "t")
    val got = df.select($"id",
        call_function("char_entropy_stats", $"t").as("st"))
      .select($"id", $"st.n", $"st.n_distinct_ch", $"st.clogc")
      .as[(Long, Option[Long], Option[Int], Option[Double])]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, Some(4L), Some(2), Some(4 * math.log(2)))))
    assert(got(1)._2.contains(3L) && got(1)._3.contains(2))
    assert(math.abs(got(1)._4.get - 2 * math.log(2)) < 1e-12)
    assert(got(2) == ((3L, Some(0L), Some(0), Some(0.0))))
    assert(got(3)._2.isEmpty) // null in → null struct out
    assert(got(4) == ((5L, Some(1L), Some(1), Some(0.0))))
  }

  test("char_entropy_stats grows past 1024 distinct code points") {
    // 2000 distinct BMP chars, each once: entropy inputs n=2000, d=2000
    val big = (0x4E00 until 0x4E00 + 2000).map(_.toChar).mkString
    val got = Seq((1L, big)).toDF("id", "t")
      .select(call_function("char_entropy_stats", $"t").as("st"))
      .select($"st.n", $"st.n_distinct_ch", $"st.clogc")
      .as[(Long, Int, Double)].head()
    assert(got == ((2000L, 2000, 0.0))) // every c=1 → c·ln(c)=0
  }

  test("bigram_rep_stats: hand cases, empty tokens, null, growth") {
    def stats(text: String) =
      Seq(text).toDF("t")
        .select(call_function("bigram_rep_stats", split($"t", " ")).as("st"))
        .select($"st.n_tok", $"st.d_tok", $"st.n2", $"st.d2", $"st.m2")
        .as[(Int, Int, Long, Long, Long)].head()
    // "a b a b" → bigrams: "a b","b a","a b" → n2=3 d2=2 m2=2
    assert(stats("a b a b") == ((4, 3 - 1, 3L, 2L, 2L)))
    // consecutive spaces make EMPTY tokens, which count like the explode
    // form's group-by-string: "a  b" → tokens [a, "", b], bigrams a·"", ""·b
    assert(stats("a  b") == ((3, 3, 2L, 2L, 1L)))
    // single token → no bigrams
    assert(stats("solo") == ((1, 1, 0L, 0L, 0L)))
    // growth: 3000 distinct tokens → 2999 distinct bigrams > initial 2048
    val big = (0 until 3000).map(i => s"t$i").mkString(" ")
    assert(stats(big) == ((3000, 3000, 2999L, 2999L, 1L)))
    // null array → null struct
    val r = Seq(Option.empty[String]).toDF("t")
      .select(call_function("bigram_rep_stats", split($"t", " ")).as("st"))
      .select($"st.n_tok").as[Option[Int]].head()
    assert(r.isEmpty)
  }

  test("both expressions participate in whole-stage codegen") {
    val docs = graft.Tables.documents(spark, sfDir)
    for ((fn, arg) <- Seq(
        ("char_entropy_stats", col("text")),
        ("bigram_rep_stats", split(col("text"), " ")))) {
      val plan = docs.select(call_function(fn, arg))
        .queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.toLowerCase.contains(fn.replace("_", "")) && l.trim.startsWith("*(")),
        s"$fn not codegen'd:\n$plan")
    }
  }
}
