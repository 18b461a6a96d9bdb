package graft.llm

import java.security.MessageDigest
import graft.{SparkSpec, SparkEntry, Tables}

/** Driver-side reference recomputation of the chunk-grain text operators
  * over the REAL sf0.001 corpus: the distributed span scrub, winnowing
  * pair detection, and per-key EMA fold are each re-derived in plain
  * sequential Scala from the collected documents/events, and the query
  * output must match exactly. This is the engine-independent check the
  * DuckDB oracle can't give (DuckDB shares SQL semantics; this shares
  * nothing but the spec).
  */
class TextOpsDifferentialSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("llm_span_scrub matches a sequential reference on the real corpus") {
    // reference: global first-occurrence keeper per distinct chunk
    val chunks = docs.flatMap { case (id, text) =>
      text.split(" ", -1).grouped(25).zipWithIndex.map { case (c, i) =>
        (id, i.toLong, c.mkString(" "))
      }
    }
    val keeper = chunks.groupBy(_._3).map { case (c, occ) =>
      c -> occ.map(o => (o._1, o._2)).min
    }
    val expected = chunks.groupBy(_._1).map { case (id, cs) =>
      val kept = cs.filter(c => keeper(c._3) == ((c._1, c._2)))
        .sortBy(_._2).map(_._3)
      id -> (cs.length.toLong, kept.length.toLong,
        md5hex(kept.mkString(" ")))
    }
    val got = SparkEntry.queries("llm_span_scrub")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == expected)
    // and the global invariant: every distinct chunk kept exactly once
    assert(got.values.map(_._2).sum == keeper.size.toLong)
  }

  test("llm_winnow matches a sequential reference on the real corpus") {
    def gramHash(g: String): Long =
      java.lang.Long.parseLong(md5hex(g).take(7), 16)
    val fps = docs.flatMap { case (id, text) =>
      val l = text.split(" ", -1)
      if (l.length < 8) Seq()
      else {
        val h = l.sliding(4).map(g => gramHash(g.mkString(" "))).toVector
        h.sliding(5).map(_.min).toSet.toSeq.map((fp: Long) => (fp, id))
      }
    }
    val expected = fps.groupBy(_._1).filter { case (_, ds) =>
      ds.size >= 2 && ds.size <= 50
    }.toSeq.flatMap { case (fp, ds) =>
      val ids = ds.map(_._2).sorted
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.groupBy(identity).collect {
      case (pair, shared) if shared.size >= 3 => pair -> shared.size.toLong
    }.toMap
    val got = SparkEntry.queries("llm_winnow")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("llm_exact_substr matches a sequential reference on the real corpus") {
    // reference groups by the WINDOW STRING itself (not the md5 the
    // distributed shape ships) — agreement also proves no md5 collision
    // perturbed the duplicate set on this corpus
    val L = 12
    val windows = docs.flatMap { case (id, text) =>
      val l = text.split(" ", -1)
      if (l.length < L) Seq()
      else (1 to l.length - L + 1).map(p =>
        (id, p, l.slice(p - 1, p - 1 + L).mkString(" ")))
    }
    val dup = windows.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expected = windows.filter(w => dup(w._3))
      .groupBy(_._1).toSeq.flatMap { case (id, ws) =>
        // island merge: covers [p, p+L-1]; a seed starting INSIDE the
        // running coverage fuses, one starting just past it breaks (the
        // distributed brk rule: p > max(prev p + L - 1))
        val ps = ws.map(_._2).sorted
        val spans = ps.foldLeft(List.empty[(Int, Int)]) { (acc, p) =>
          acc match {
            case (s, e) :: rest if p <= e =>
              (s, math.max(e, p + L - 1)) :: rest
            case _ => (p, p + L - 1) :: acc
          }
        }.reverse
        spans.map { case (s0, e0) => (id, s0.toLong, e0.toLong) }
      }.toSet
    val got = SparkEntry.queries("llm_exact_substr")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("w29_ema matches the sequential per-key fold on the real events") {
    val series = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getDouble(3)))
      .groupBy(_._1)
    val expected = series.map { case (u, rows) =>
      val vs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val ema = vs.tail.foldLeft(vs.head)((acc, v) => 0.25 * v + 0.75 * acc)
      u -> (rows.length.toLong,
        BigDecimal(ema).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = SparkEntry.queries("w29_ema")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got == expected)
  }
}
