package graft

import java.time.{LocalDate, ZoneId}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-style tests: randomized inputs (fixed seed), bulk-evaluated in
  * one Spark job, validated against independent Scala/java.time oracles.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val madrid = ZoneId.of("Europe/Madrid")
  private val seed = rng.Seed(42L)

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, seed).get

  test("property: quarter-index mapping matches java.time on random dates") {
    val genDate = Gen.choose(0L, 365L * 10)
      .map(LocalDate.of(2020, 1, 1).plusDays(_))
    val dates = samples(genDate, 300).distinct
    val rows = dates.map { d =>
      val quarters = (java.time.Duration.between(
        d.atStartOfDay(madrid), d.plusDays(1).atStartOfDay(madrid))
        .toMinutes / 15).toInt
      (d.toString, quarters)
    }
    val out = rows.toDF("fecha", "n")
      .withColumn("idx", explode(sequence(lit(1), col("n"))))
      .select(col("fecha"), col("idx"),
        graft.time.MadridTime.utcFromQuarterIndex(to_date(col("fecha")),
          col("idx")).as("utc"))
      .as[(String, Int, java.sql.Timestamp)].collect()
    assert(out.length == rows.map(_._2).sum)
    out.foreach { case (f, idx, ts) =>
      // independent oracle: java.time local midnight + (idx-1)×15 min
      val expected = LocalDate.parse(f).atStartOfDay(madrid).toInstant
        .plusSeconds((idx - 1) * 900L)
      assert(ts.toInstant == expected, s"$f idx=$idx")
    }
    // and each local day is exactly covered: last quarter ends at next midnight
    rows.foreach { case (f, n) =>
      val d = LocalDate.parse(f)
      val lastStart = d.atStartOfDay(madrid).toInstant.plusSeconds((n - 1) * 900L)
      assert(lastStart.plusSeconds(900) == d.plusDays(1).atStartOfDay(madrid).toInstant)
    }
  }

  test("property: keepLast keeps exactly the max-precedence row per key") {
    val genRow = for {
      k <- Gen.choose(0, 20)
      v <- Gen.choose(-1000.0, 1000.0)
    } yield (k, v)
    val raw = samples(genRow, 400).zipWithIndex
      .map { case ((k, v), i) => (k, v, i.toLong) } // unique precedence
    val df = raw.toDF("k", "v", "prec")
    val got = graft.lake.Lake.keepLast(df, Seq("k"), col("prec"))
      .select("k", "v", "prec").as[(Int, Double, Long)].collect()
    val expected = raw.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._3) }.toSet
    assert(got.toSet == expected)
    assert(got.map(_._1).distinct.length == got.length) // one row per key
  }

  test("property: shingle_codes equals the composed distinct-md5 set on " +
      "random token arrays") {
    val genTok = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(""),
      Gen.oneOf("a", "b", "ñ", "日本", "x y")) // incl. unicode + space-in-token
    val genDoc = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, genTok))
    val docs = samples(genDoc, 200).zipWithIndex
      .map { case (l, i) => (i.toLong, l) }
    val got = docs.toDF("id", "l")
      .select($"id", call_function("shingle_codes", $"l").as("cs"))
      .as[(Long, Seq[Long])].collect().toMap
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def code(s: String): Long = {
      md5.reset()
      val d = md5.digest(s.getBytes("UTF-8"))
      var v = 0L
      (0 until 7).foreach(i => v = (v << 8) | (d(i) & 0xffL))
      (v << 4) | ((d(7) >> 4) & 0xfL)
    }
    docs.foreach { case (i, l) =>
      val want = l.sliding(3).filter(_.length == 3)
        .map(w => code(w.mkString(" "))).toSeq.distinct
      assert(got(i) == want, s"doc $i: $l")
    }
  }

  test("property: collect_bounded equals exact distinct sets under the " +
      "limit, NULL over it") {
    val genRow = for {
      k <- Gen.choose(0, 15)
      v <- Gen.choose(0L, 12L)
    } yield (k, v)
    val rows = samples(genRow, 600)
    val got = rows.toDF("k", "v").repartition(16)
      .groupBy("k").agg(expr("collect_bounded(v, 6)").as("s"))
      .as[(Int, Option[Seq[Long]])].collect().toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val distinct = rs.map(_._2).distinct.sorted
      if (distinct.length > 6) assert(got(k).isEmpty, s"key $k")
      else assert(got(k).contains(distinct), s"key $k")
    }
  }

  test("property: topk_structs equals sortBy.take on random groups") {
    val genRow = for {
      k <- Gen.choose(0, 10)
      p <- Gen.choose(-50, 50)
      id <- Gen.choose(0L, 10000L)
    } yield (k, p, id)
    val rows = samples(genRow, 500).distinct
    val got = rows.toDF("k", "p", "id").repartition(16)
      .groupBy("k")
      .agg(expr("topk_structs(struct(p, id), 5, array(true, false))").as("t"))
      .select($"k", expr("transform(t, r -> struct(r.p, r.id))"))
      .as[(Int, Seq[(Int, Long)])].collect().toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val want = rs.map(r => (r._2, r._3))
        .sortBy { case (p, id) => (-p, id) }.take(5)
      assert(got(k) == want, s"group $k")
    }
  }

  test("property: European decimal parse round-trips formatted values") {
    val gen = Gen.choose(-999999999L, 999999999L).map(c => BigDecimal(c, 2))
    val vals = samples(gen, 300)
    val eu = vals.map { v =>
      val s = v.abs.setScale(2).toString
      val Array(ip, fp) = s.split("\\.")
      val grouped = ip.reverse.grouped(3).mkString(".").reverse
      (if (v < 0) "-" else "") + grouped + "," + fp
    }
    val out = eu.toDF("s")
      .select(graft.ingest.Ingest.parseEuropeanDecimal(col("s")))
      .as[Double].collect()
    out.zip(vals).foreach { case (got, want) =>
      assert(got == want.toDouble, s"$want")
    }
  }

  test("property: winnow_prints matches a sequential reference on random token arrays") {
    // random short vocab forces gram collisions and window-min ties —
    // the structural cases the fixed corpus rarely hits
    val genDoc = for {
      n <- Gen.choose(0, 40)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba", "x y".trim))
    } yield toks
    val docs = samples(genDoc, 300).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }
    def gramHash(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    val expected = docs.map { case (id, toks) =>
      val hs = toks.sliding(4).filter(_.length == 4)
        .map(g => gramHash(g.mkString(" "))).toVector
      val fps =
        if (hs.length < 5) Vector[Long]()
        else hs.sliding(5).map(_.min).toVector.distinct
      id -> fps
    }.toMap
    val got = docs.toDF("id", "l")
      .select($"id", call_function("winnow_prints", $"l").as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got.keySet == expected.keySet)
    for ((id, fps) <- expected)
      assert(got(id) == fps, s"doc $id: got ${got(id)}, want $fps")
  }

  test("property: ascii_count matches a String.count oracle on random unicode text") {
    // strings mixing ASCII (incl. the target), multi-byte BMP and
    // supplementary-plane code points — the byte-walk must never match an
    // ASCII target inside a multi-byte UTF-8 sequence
    val genChunk = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.const(" "), Gen.const("  "),
      Gen.const("ñé漢字"), Gen.const("🎉🜁"), Gen.const("x x"),
      Gen.const(""), Gen.const("\tx\n"))
    val genText = Gen.choose(0, 12)
      .flatMap(n => Gen.listOfN(n, genChunk).map(_.mkString))
    val texts = samples(genText, 400)
    for (target <- Seq(' ', 'x', '0')) {
      val expected = texts.map(t => t.count(_ == target))
      val got = texts.toDF("t")
        .select(call_function("ascii_count", col("t"),
          lit(target.toString)))
        .as[Int].collect().toSeq
      assert(got == expected, s"target '$target'")
    }
  }
}
