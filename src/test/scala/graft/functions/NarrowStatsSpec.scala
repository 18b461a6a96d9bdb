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

  test("shingle_codes: hand cases, dedup order, nulls, growth") {
    def codes(toks: Seq[String]) =
      Seq(Tuple1(toks)).toDF("l")
        .select(call_function("shingle_codes", $"l").as("cs"))
        .as[Seq[Long]].head()
    def one(s: String) =
      Seq(s).toDF("t")
        .select(call_function("md5_prefix60", $"t").as("x"))
        .as[Long].head()
    // 4 tokens → shingles "a b c", "b c d"
    assert(codes(Seq("a", "b", "c", "d")) ==
      Seq(one("a b c"), one("b c d")))
    // repeated shingle dedups, keeping first appearance:
    // windows are "a b c","b c a","c a b","a b c"(dup)
    assert(codes(Seq("a", "b", "c", "a", "b", "c")) ==
      Seq(one("a b c"), one("b c a"), one("c a b")))
    // fewer than 3 tokens → no shingles
    assert(codes(Seq("a", "b")) == Seq.empty)
    // empty-string tokens participate exactly like concat_ws's output
    assert(codes(Seq("a", "", "b")) == Seq(one("a  b")))
    // growth: 3000 distinct shingles > initial 2048 scratch capacity
    val big = (0 until 3002).map(i => s"t$i")
    assert(codes(big).length == 3000)
    // null array → null out
    val r = Seq(Option.empty[String]).toDF("t")
      .select(call_function("shingle_codes", split($"t", " ")).as("cs"))
      .select($"cs".isNull).as[Boolean].head()
    assert(r)
  }

  test("shingle_codes + minhash_sig are bit-identical to the composed " +
      "explode/groupBy form over the corpus") {
    val toks = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", split($"text", " ").as("l"))
      .filter(size($"l") >= 3)
    // composed reference: explode every 3-shingle, md5_prefix60, group
    val ref = toks
      .select($"doc_id", $"l",
        explode(expr("sequence(1, size(l) - 2)")).as("i"))
      .select($"doc_id",
        expr("""md5_prefix60(concat_ws(' ', element_at(l, i),
                element_at(l, i + 1), element_at(l, i + 2)))""").as("x"))
      .groupBy("doc_id")
      .agg(collect_set($"x").as("hs"),
        min(expr(s"(1103515245L * shiftright(x, 32) + 12345L) % 2147483647L"))
          .as("mh0"))
    val narrow = toks.select($"doc_id",
        call_function("shingle_codes", $"l").as("cs"))
      .select($"doc_id", $"cs",
        expr("minhash_sig(cs, array(1103515245L), array(12345L), 2147483647L)")
          .as("sig"))
    val joined = ref.join(narrow, "doc_id")
      .select($"doc_id",
        (size(array_except($"hs", $"cs")) === 0 &&
         size(array_except($"cs", $"hs")) === 0).as("sameSet"),
        ($"mh0" === element_at($"sig", 1)).as("sameMin"))
    val bad = joined.filter(!$"sameSet" || !$"sameMin").count()
    assert(bad == 0, s"$bad docs diverge from the composed form")
    assert(joined.count() > 0)
  }

  test("simhash_votes matches the composed vocabulary-join form " +
      "over the corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    // composed reference: per-(doc,tok) tf → md5 bit vectors → vote sums
    val toks = docs
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("w"))
    val vocab = toks.select("tok").distinct()
      .withColumn("bits", expr(
        """transform(sequence(0, 31), j ->
             CAST((shiftright(instr('0123456789abcdef',
                                    substr(md5(tok), 1 + j div 4, 1)) - 1,
                              j % 4) & 1) * 2 - 1 AS BIGINT))"""))
    val sums = (0 until 32).map(j =>
      sum(expr(s"w * element_at(bits, ${j + 1})")).as(s"v$j"))
    val ref = toks.join(vocab, "tok").groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select($"doc_id", array((0 until 32).map(j => col(s"v$j")): _*).as("rv"))
    val narrow = docs.select($"doc_id",
      call_function("simhash_votes", split($"text", " ")).as("nv"))
    val bad = ref.join(narrow, "doc_id")
      .filter($"rv" =!= $"nv").count()
    assert(bad == 0, s"$bad docs diverge from the composed vote sums")
    // null text yields null votes (the old explode produced no rows)
    val r = Seq(Option.empty[String]).toDF("t")
      .select(call_function("simhash_votes", split($"t", " ")).isNull)
      .as[Boolean].head()
    assert(r)
  }

  test("winnow_prints equals the composed transform/md5 chain over the corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", split($"text", " ").as("l"))
      .filter(size($"l") >= 8)
    val composed = docs
      .select($"doc_id", expr(
        """transform(sequence(1, size(l) - 3),
             i -> CAST(conv(substr(md5(concat_ws(' ', slice(l, i, 4))),
                                   1, 7), 16, 10) AS BIGINT))""").as("h"))
      .select($"doc_id", array_sort(array_distinct(expr(
        """transform(sequence(1, size(h) - 4),
             j -> array_min(slice(h, j, 5)))"""))).as("ref"))
    val narrow = docs.select($"doc_id",
      array_sort(call_function("winnow_prints", $"l")).as("nw"))
    val bad = composed.join(narrow, "doc_id")
      .filter($"ref" =!= $"nw").count()
    assert(bad == 0, s"$bad docs diverge from the composed winnowing chain")
    // short input (< K+W-1 tokens → no full window) yields an empty array
    val short = Seq("a b c d e f g").toDF("t")
      .select(size(call_function("winnow_prints", split($"t", " "))))
      .as[Int].head()
    assert(short == 0)
    // null array in → null out
    val nl = Seq(Option.empty[String]).toDF("t")
      .select(call_function("winnow_prints", split($"t", " ")).isNull)
      .as[Boolean].head()
    assert(nl)
  }

  test("window_hashes: rolling equals direct, boundaries, width guard") {
    // rolling recurrence must equal a direct per-window polynomial — the
    // collision-freedom claim rests on the roll-off term being exact.
    // Both 64-bit lanes of the 128-bit pair are asserted independently.
    val toks = (0 until 40).map(i => s"t${i % 11}")
    val got = Seq(Tuple1(toks)).toDF("l")
      .select(call_function("window_hashes", $"l", lit(5)).as("hs"))
      .as[Seq[(Long, Long)]].head()
    assert(got.length == 36)
    // direct recompute of a few windows via single-window calls
    for (p <- Seq(0, 17, 35)) {
      val w = toks.slice(p, p + 5)
      val direct = Seq(Tuple1(w)).toDF("l")
        .select(call_function("window_hashes", $"l", lit(5)).as("hs"))
        .as[Seq[(Long, Long)]].head()
      assert(direct.length == 1 && direct.head == got(p),
        s"rolling hash at $p diverges from direct")
    }
    // identical windows collide wherever they appear (both lanes)
    assert(got(0) == got(11) && got(11) == got(22)) // period-11 tokens
    // the two lanes are not the same function: distinct windows whose
    // lane-1 values differ must not have h1 == h2 systematically, and
    // adjacent distinct windows differ in BOTH lanes
    assert(got(0)._1 != got(1)._1 && got(0)._2 != got(1)._2)
    assert(got.map(_._1) != got.map(_._2))
    // shorter than the window → empty
    val short = Seq(Tuple1(Seq("a", "b"))).toDF("l")
      .select(size(call_function("window_hashes", $"l", lit(5))))
      .as[Int].head()
    assert(short == 0)
    // null array → null; null token hashes distinctly from empty string
    val nl = Seq(Option.empty[String]).toDF("t")
      .select(call_function("window_hashes", split($"t", " "), lit(3)).isNull)
      .as[Boolean].head()
    assert(nl)
    val nullTok = Seq(Tuple1(Seq[String]("a", null, "b"))).toDF("l")
      .select(call_function("window_hashes", $"l", lit(3)).as("hs"))
      .as[Seq[(Long, Long)]].head()
    val emptyTok = Seq(Tuple1(Seq("a", "", "b"))).toDF("l")
      .select(call_function("window_hashes", $"l", lit(3)).as("hs"))
      .as[Seq[(Long, Long)]].head()
    assert(nullTok.head != emptyTok.head)
    // width must be a literal
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(Seq("a"))).toDF("l")
        .select(call_function("window_hashes", $"l", $"l")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("window_hashes"))
  }

  test("marker_counts matches the composed \\b regex battery") {
    val markers = Seq("the", "sort", "merge", "join")
    def composed(c: org.apache.spark.sql.Column) = markers.map(m =>
      size(regexp_extract_all(c, lit("\\b" + m + "\\b"), lit(0))))
    def fused(c: org.apache.spark.sql.Column) = {
      val mc = call_function("marker_counts", c,
        array(markers.map(lit): _*))
      markers.indices.map(mc(_))
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val bad = docs.select((composed(col("text")).zip(fused(col("text")))
        .map { case (a, b) => a =!= b }.reduce(_ || _)).as("diff"))
      .filter(col("diff")).count()
    assert(bad == 0, s"$bad docs diverge from the composed \\b battery")
    // boundary semantics the corpus may not exercise: containment is not
    // a match (them), \w includes digits/underscore (the1, the_), leading
    // /trailing markers bound on string edges, punctuation is a boundary
    val cases = Seq("the", "them", "the1 the_ the", "the,the;the",
      " the THE tHe the ", "sortsort sort-sort sort_sort",
      "join.join!join", "", "a", "merge\nmerge\tmerge",
      // non-ASCII: Java \b is Unicode-aware even WITHOUT
      // UNICODE_CHARACTER_CLASS (Pattern.Bound tests '_' ||
      // isLetterOrDigit over code points) — adjacent non-ASCII letters
      // EXTEND the word run and kill the match; non-letter symbols and
      // emoji stay boundaries (ADVICE r13)
      "éthe theé éthe", "漢the the漢 漢字 the",
      "𝔸the the𝔸",   // 𝔸 supplementary-plane letter
      "😀the the😀",   // 😀 non-letter: boundary holds
      "१the the१",                         // Devanagari digit: word char
      "¡the! «the» the…", "ñ-the-ñ the")
    val diffs = cases.toDF("t")
      .select((composed(col("t")).zip(fused(col("t")))
        .map { case (a, b) => a =!= b }.reduce(_ || _)).as("diff"))
      .collect().map(_.getBoolean(0))
    assert(!diffs.exists(identity), s"hand cases diverge: ${
      cases.zip(diffs).filter(_._2).map(_._1).mkString("; ")}")
    // null text -> null counts
    assert(Seq(Option.empty[String]).toDF("t")
      .select(call_function("marker_counts", $"t",
        array(lit("the"))).isNull).as[Boolean].head())
    // non-literal marker array is an analysis-time error
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", "y")).toDF("t", "m")
        .select(call_function("marker_counts", $"t", array($"m"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("marker_counts"))
    // non-\w marker literals are rejected (they'd need the regex engine)
    val e2 = intercept[Exception] {
      Seq(Tuple1("x")).toDF("t")
        .select(call_function("marker_counts", $"t",
          array(lit("a b")))).collect()
    }
    assert(e2.getMessage.contains("marker"))
    // a literal array of the WRONG element type and a NULL element are
    // analysis-time AnalysisExceptions, not executor ClassCastException/
    // NPE (ADVICE r13)
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1("x")).toDF("t")
        .select(call_function("marker_counts", $"t", array(lit(1)))).collect()
    }
    assert(e3.getMessage.toLowerCase.contains("marker_counts"))
    val e4 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1("x")).toDF("t")
        .select(call_function("marker_counts", $"t",
          array(lit(null).cast("string")))).collect()
    }
    assert(e4.getMessage.toLowerCase.contains("null"))
  }

  test("gopher_stats matches the composed regex battery over the corpus") {
    def composedCols(c: org.apache.spark.sql.Column) = Seq(
      size(regexp_extract_all(c, lit("[^ ]+"), lit(0))),
      size(regexp_extract_all(c, lit("[^ ]*[a-zA-Z][^ ]*"), lit(0))),
      size(regexp_extract_all(c, lit("[#{}<>|]"), lit(0))),
      size(regexp_extract_all(c, lit(" the | and | that | with "), lit(0))),
      length(regexp_replace(c, " ", "")),
      c.rlike("[.!?] *$").cast("int"))
    def fusedCols(c: org.apache.spark.sql.Column) = {
      val g = call_function("gopher_stats", c)
      Seq(g.getField("n_words"), g.getField("n_alpha"), g.getField("n_sym"),
        g.getField("n_stop"), g.getField("n_nosp"), g.getField("r_term"))
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val bad = docs.select((composedCols(col("text"))
        .zip(fusedCols(col("text"))).map { case (a, b) => a =!= b }
        .reduce(_ || _)).as("diff"))
      .filter(col("diff")).count()
    assert(bad == 0, s"$bad docs diverge from the composed regex battery")
    // hand cases the corpus may not contain
    val cases = Seq(
      " the and that with ",      // back-to-back stopwords: consumed spaces
      " the the ",                // trailing space of a match is spent
      "a#b{c}<d>|e",              // symbol class inside one run
      "x9 42 a1b",                // alpha counts runs WITH a letter only
      "ends well.",               // r_term plain
      "ends well.   ",            // r_term through trailing spaces
      "ends well. \n",            // $ before a final newline
      "no end\nhere",             // newline mid-text does not anchor
      "half? ",                   // '?' terminator
      "😀 wide",        // surrogate pair: length counts code points
      "")
    val df = cases.toDF("t")
    val got = df.select(fusedCols(col("t")): _*).collect()
    val ref = df.select(composedCols(col("t")): _*).collect()
    for (((g, r), c) <- got.zip(ref).zip(cases))
      assert(g == r, s"gopher_stats diverges on <$c>: got $g want $r")
    // null in -> null out
    val nl = Seq(Option.empty[String]).toDF("t")
      .select(call_function("gopher_stats", $"t").isNull).as[Boolean].head()
    assert(nl)
  }

  test("pii_scrub matches the composed regex pipeline over the corpus") {
    // the same augmentation the llm_pii_redact row applies, so the scanner
    // is exercised on text that actually contains emails and phones
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", concat($"text",
        when($"doc_id" % 7 === 0,
          concat(lit(" contact user"), $"doc_id", lit("@example.com now")))
          .when($"doc_id" % 7 === 3,
            concat(lit(" call 555-"),
              lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
              lit(" today")))
          .otherwise(lit(""))).as("aug"))
    val composed = docs.select($"doc_id",
      size(regexp_extract_all($"aug",
        lit("[a-z0-9.]+@[a-z0-9.]+"), lit(0))).as("n_email"),
      size(regexp_extract_all($"aug",
        lit("[0-9]{3}-[0-9]{4}"), lit(0))).as("n_phone"),
      regexp_replace(
        regexp_replace($"aug", "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
        "[0-9]{3}-[0-9]{4}", "<PHONE>").as("redacted"))
    val fused = docs.select($"doc_id",
      call_function("pii_scrub", $"aug").as("p"))
      .select($"doc_id", $"p.n_email".as("f_email"),
        $"p.n_phone".as("f_phone"), $"p.redacted".as("f_red"))
    val bad = composed.join(fused, "doc_id")
      .filter($"n_email" =!= $"f_email" || $"n_phone" =!= $"f_phone" ||
        $"redacted" =!= $"f_red").count()
    assert(bad == 0, s"$bad docs diverge from the composed regex pipeline")
    // hand cases: leftmost-greedy subtleties the corpus may not contain
    val cases = Seq(
      "a@b",                      // minimal email
      "a..b@@c",                  // '@' not followed by a class char
      "x@y@z nest",               // continue AFTER the matched region
      "555-1234@x.com dial",      // email steals digits, phone counted not replaced
      "1234-5678",                // phone match starts mid-digit-run
      "123-45678 and 999-0000",   // trailing digits survive + second match
      "UPPER@CASE.COM",           // class is lowercase-only: no match
      "contact user7@example.com now call 555-0007 today",
      "")
    val got = cases.toDF("t")
      .select(call_function("pii_scrub", $"t").as("p"))
      .select($"p.n_email", $"p.n_phone", $"p.redacted")
      .collect()
    val ref = cases.toDF("t").select(
      size(regexp_extract_all($"t", lit("[a-z0-9.]+@[a-z0-9.]+"), lit(0))),
      size(regexp_extract_all($"t", lit("[0-9]{3}-[0-9]{4}"), lit(0))),
      regexp_replace(
        regexp_replace($"t", "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
        "[0-9]{3}-[0-9]{4}", "<PHONE>")).collect()
    for ((g, r) <- got.zip(ref))
      assert(g == r, s"pii_scrub diverges: got $g want $r")
    // null in → null out
    val nl = Seq(Option.empty[String]).toDF("t")
      .select(call_function("pii_scrub", $"t").isNull).as[Boolean].head()
    assert(nl)
  }

  test("int8_quant_stats is bit-identical to the composed four-fold form " +
      "over the embeddings fixture") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val composed = emb
      .select($"vec_id",
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("scale", expr(
        "greatest(aggregate(v, CAST(0 AS DOUBLE), (a, x) -> greatest(a, abs(x))), 1e-12d)"))
      .select($"vec_id", $"scale",
        expr("""aggregate(v, CAST(0 AS BIGINT),
                  (a, x) -> a + CAST(round(x * 127 / scale, 0) AS BIGINT))""")
          .as("code_sum"),
        expr("""aggregate(v, 0,
                  (a, x) -> a + CASE WHEN abs(CAST(round(x * 127 / scale, 0)
                                                   AS BIGINT)) = 127
                                     THEN 1 ELSE 0 END)""")
          .cast("int").as("n_sat"),
        expr("""aggregate(v, CAST(0 AS DOUBLE),
                  (a, x) -> a + pow(x - CAST(round(x * 127 / scale, 0)
                                             AS BIGINT) * scale / 127, 2))""")
          .as("recon_err"))
    val fused = emb.select($"vec_id",
      call_function("int8_quant_stats", $"embedding").as("q"))
      .select($"vec_id", $"q.scale".as("f_scale"),
        $"q.code_sum".as("f_code_sum"), $"q.n_sat".as("f_n_sat"),
        $"q.recon_err".as("f_recon_err"))
    // exact equality, doubles included: the fused pass must reproduce the
    // HOF fold's IEEE sequence bit for bit, not just within tolerance
    val bad = composed.join(fused, "vec_id")
      .filter($"scale" =!= $"f_scale" || $"code_sum" =!= $"f_code_sum" ||
        $"n_sat" =!= $"f_n_sat" || $"recon_err" =!= $"f_recon_err")
      .count()
    assert(bad == 0, s"$bad vectors diverge from the composed HOF form")
    // null vector in → null out
    val nl = spark.sql("SELECT CAST(NULL AS ARRAY<FLOAT>) AS e")
      .select(call_function("int8_quant_stats", $"e").isNull)
      .as[Boolean].head()
    assert(nl)
    // all-zero vector: scale floors at 1e-12, zero codes, zero error
    val z = Seq(Array(0f, 0f)).toDF("e")
      .select(call_function("int8_quant_stats", $"e").as("q"))
      .select($"q.scale", $"q.code_sum", $"q.n_sat", $"q.recon_err")
      .head()
    assert(z.getDouble(0) == 1e-12 && z.getLong(1) == 0L &&
      z.getInt(2) == 0 && z.getDouble(3) == 0d)
  }

  test("extension builders reject wrong arity at analysis (ADVICE r11)") {
    // pre-fix, extras were silently DROPPED — winnow_prints(l, 5) ran as
    // winnow_prints(l); the guard makes it an analysis error like builtins
    val df = Seq("a b c").toDF("t").select(split($"t", " ").as("l"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("winnow_prints", $"l", lit(5))).collect()
    }
    assert(e.getMessage.contains("winnow_prints"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("vec_dot", $"l")).collect()
    }
    assert(e2.getMessage.contains("vec_dot"))
  }

  test("ascii_count: split identity, unicode bytes, null, rejections") {
    // the identity llm_length_stats rides on: count(' ')+1 == len(split)
    val texts = Seq(
      "a b c", "", " ", "  ", "no-spaces", "trailing ", " leading",
      "double  space", "ñ andú é", "漢字 テスト 漢", "a\tb c", "🎉 x 🎉🎉"
    )
    val df = texts.toDF("t")
    val got = df.select(
        (call_function("ascii_count", $"t", lit(" ")) + 1).as("a"),
        size(split($"t", " ")).as("b"))
      .as[(Int, Int)].collect()
    got.foreach { case (a, b) => assert(a == b, s"identity broke: $a != $b") }
    // non-space target + exactness inside multi-byte neighborhoods: the
    // ASCII byte 'x' never matches inside ñ/漢/🎉 UTF-8 sequences
    val xs = Seq(("ñxñ", 1), ("xx漢x", 3), ("🎉", 0), ("", 0))
    xs.foreach { case (t, n) =>
      val c = Seq(t).toDF("t")
        .select(call_function("ascii_count", $"t", lit("x")))
        .as[Int].head()
      assert(c == n, s"'$t' -> $c, want $n")
    }
    // null in → null out
    val nl = Seq(Option.empty[String]).toDF("t")
      .select(call_function("ascii_count", $"t", lit(" ")))
      .as[Option[Int]].head()
    assert(nl.isEmpty)
    // analysis-time rejections: non-literal, multi-char, non-ASCII target
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("ascii_count", $"t", $"t")).collect()
    }
    assert(e1.getMessage.contains("ascii_count"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("ascii_count", $"t", lit("ab"))).collect()
    }
    assert(e2.getMessage.contains("ascii_count"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("ascii_count", $"t", lit("ñ"))).collect()
    }
    assert(e3.getMessage.contains("ascii_count"))
  }

  test("all narrow expressions participate in whole-stage codegen") {
    val docs = graft.Tables.documents(spark, sfDir)
    for ((fn, arg) <- Seq(
        ("char_entropy_stats", col("text")),
        ("bigram_rep_stats", split(col("text"), " ")),
        ("shingle_codes", split(col("text"), " ")),
        ("winnow_prints", split(col("text"), " ")))) {
      // (ascii_count asserted separately below — two-arg literal form)
      val plan = docs.select(call_function(fn, arg))
        .queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.toLowerCase.contains(fn.replace("_", "")) && l.trim.startsWith("*(")),
        s"$fn not codegen'd:\n$plan")
    }
    val embPlan = graft.Tables.embeddings(spark, sfDir)
      .select(call_function("int8_quant_stats", col("embedding")))
      .queryExecution.executedPlan.toString
    assert(embPlan.linesIterator.exists(l =>
      l.toLowerCase.contains("int8quantstats") && l.trim.startsWith("*(")),
      s"int8_quant_stats not codegen'd:\n$embPlan")
    val acPlan = docs
      .select(call_function("ascii_count", col("text"), lit(" ")))
      .queryExecution.executedPlan.toString
    assert(acPlan.linesIterator.exists(l =>
      l.contains("ascii_count") && l.trim.startsWith("*(")),
      s"ascii_count not codegen'd:\n$acPlan")
  }
}
