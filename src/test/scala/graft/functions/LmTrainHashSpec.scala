package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential specs for the r16 narrow training/fingerprint expressions:
  * `bigram_counts` vs the instance-grain explode formulation it replaced,
  * and `token_roll_hash` vs the interpreted string-fold — both over the
  * real corpus and adversarial unicode/whitespace edges.
  */
class LmTrainHashSpec extends SparkSpec {
  import spark.implicits._

  private val edgeTexts = Seq(
    1L -> "the cat sat on the mat",
    2L -> "España año señal ñaña",      // 2-byte UTF-8 code points
    3L -> "aaaaaaaa",                    // one repeated bigram
    4L -> "ab",                          // exactly one bigram
    5L -> "𝕏y 𝕏y 𝕏z",                    // supplementary-plane (surrogate pairs)
    6L -> "  double  spaces  ",          // empty split fields
    7L -> " ",                           // whitespace only → no tokens
    8L -> "tok",                         // single token
    9L -> "a b a b a")

  // the displaced instance-grain form is NOT code-point-faithful on the
  // supplementary plane: split(text, "(?!^)") splits between surrogate
  // HALVES and the halves round-trip through UTF-8 as '?' — mangled keys
  // that disagree with BOTH the native scorer's codePointAt walk and the
  // DuckDB oracle's code-point substr. bigram_counts follows the
  // scorer/oracle semantics, so the composed-form differential runs on
  // the BMP-only set and the astral doc gets its own hand-check below.
  private val bmpTexts = edgeTexts.filterNot(_._1 == 5L)

  test("bigram_counts aggregate ≡ instance-grain explode counts (corpus + edges)") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(bmpTexts.toDF("doc_id", "text")
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .filter(length(col("text")) >= 2)
    // displaced shape: one row per bigram instance, string grain
    val expected = corpus
      .withColumn("cs", split(col("text"), "(?!^)"))
      .select(explode(expr("sequence(1, size(cs) - 2)")).as("i"), col("cs"))
      .select(expr("concat(element_at(cs, i), element_at(cs, i+1))").as("g"))
      .groupBy("g").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => BigramLm.packKey(r.getString(0)) -> r.getLong(1))
      .sortBy(_._1)
    val got = corpus
      .select(explode(expr("bigram_counts(text)")).as("gn"))
      .groupBy(col("gn.g").as("g")).agg(sum(col("gn.n")).as("n"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.sameElements(expected))
  }

  test("bigram_counts: null text → null; <2 code points → empty array") {
    val got = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Some("")),
        (4L, Some("ab")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), expr("bigram_counts(text)").as("h"))
      .orderBy("doc_id").collect()
    assert(got(0).isNullAt(1))
    assert(got(1).getSeq[Any](1).isEmpty)
    assert(got(2).getSeq[Any](1).isEmpty)
    assert(got(3).getSeq[Any](1).length == 1)
  }

  test("bigram_counts codegen and interpreted paths agree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    // interpreted path: direct eval on the expression
    def evalPairs(t: String): Seq[(Long, Long)] = {
      val e = BigramCounts(Literal(UTF8String.fromString(t),
        org.apache.spark.sql.types.StringType))
      val a = e.eval(null).asInstanceOf[ArrayData]
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
    }
    // codegen path: through a projection over a DataFrame
    def dfPairs(t: String): Seq[(Long, Long)] =
      Seq(t).toDF("text")
        .select(explode(expr("bigram_counts(text)")).as("gn"))
        .select(col("gn.g"), col("gn.n"))
        .as[(Long, Long)].collect().toSeq
    edgeTexts.map(_._2).foreach { t =>
      assert(evalPairs(t) == dfPairs(t), s"codegen/interpreted split on: $t")
    }
    // spot-check one packing by hand: "ab" → one bigram 'a'·0x110000+'b'
    assert(evalPairs("ab") == Seq(('a'.toLong * 0x110000L + 'b'.toLong, 1L)))
    // supplementary plane walks CODE POINTS (the scorer/oracle rule):
    // "𝕏y" is exactly one bigram (U+1D54F, 'y'), never surrogate halves
    assert(evalPairs("𝕏y") ==
      Seq(0x1D54FL * 0x110000L + 'y'.toLong -> 1L))
  }

  /** The interpreted fold llm_fingerprint carried through r15. */
  private def foldRh = expr(
    """CAST(aggregate(filter(split(text, ' '), t -> t != ''), '0',
         (acc, t) -> CAST((CAST(acc AS BIGINT) * 131
            + (instr('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 16
            + instr('0123456789abcdef', substr(md5(t), 2, 1)) - 1)
                          % 1000000007 AS STRING))
       AS BIGINT)""")

  test("token_roll_hash ≡ the interpreted fold (corpus + edges + null)") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(edgeTexts.toDF("doc_id", "text")
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val rows = corpus
      .select(col("doc_id"), foldRh.as("want"),
        expr("token_roll_hash(text)").as("got"))
      .filter(col("want") =!= col("got")).count()
    assert(rows == 0L)
    // empty token list → seed 0 on both paths; null text → null
    val edge = Seq((1L, Some(" ")), (2L, Some("")), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
      .select(col("doc_id"), foldRh.as("want"),
        expr("token_roll_hash(text)").as("got"))
      .orderBy("doc_id").collect()
    assert(edge(0).getLong(1) == 0L && edge(0).getLong(2) == 0L)
    assert(edge(1).getLong(1) == 0L && edge(1).getLong(2) == 0L)
    assert(edge(2).isNullAt(1) && edge(2).isNullAt(2))
  }

  test("token_runs ≡ size(regexp_extract_all(text, '[^ ]+')) on corpus + edges") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text"))
      .unionByName(edgeTexts.map(_._2).toDF("text"))
    val bad = corpus.select(
        size(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))).as("want"),
        expr("token_runs(text)").as("got"))
      .filter(col("want") =!= col("got")).count()
    assert(bad == 0L)
    // null text → null on both forms
    val nr = Seq(Option.empty[String]).toDF("text")
      .select(size(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0)))
        .as("want"), expr("token_runs(text)").as("got")).collect().head
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("token_roll_hash randomized differential (unicode tokens)") {
    val rnd = new scala.util.Random(16)
    val alphabet = "ab España ñ 𝕏 z".split(" ")
    val texts = (1 to 200).map { i =>
      val n = rnd.nextInt(40)
      (i.toLong, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString(" "))
    }
    val bad = texts.toDF("doc_id", "text")
      .select(foldRh.as("want"), expr("token_roll_hash(text)").as("got"))
      .filter(col("want") =!= col("got")).count()
    assert(bad == 0L)
  }
}
