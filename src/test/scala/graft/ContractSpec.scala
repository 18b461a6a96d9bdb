package graft

/** Driver-contract regression gate: Verify must dump one parquet dir per
  * registered query plus parseable oracle JSON; Bench must emit one valid
  * JSON line with a time per query and an empty error map.
  */
class ContractSpec extends SparkSpec {

  test("Verify.run dumps every query and valid oracle_sql.json") {
    val out = tmpDir() + "/vout"
    Verify.run(spark, sfDir, out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).toSet
    val missing = SparkEntry.queries.keySet.diff(dirs)
    assert(missing.isEmpty, s"queries without dumps: $missing")
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    // parse with Spark's bundled JSON parser as an independent check
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    assert(node.size() == SparkEntry.oracleSql.size)
    SparkEntry.oracleSql.keys.foreach(k => assert(node.has(k), k))
  }

  test("registry invariants: no duplicate names across query modules") {
    // SparkEntry concatenates per-module Seqs and toMap-dedups — a name
    // collision would SILENTLY shadow one module's query with another's
    // and the gate would verify the survivor, not both
    val names = Seq(graft.queries.Relational.all, graft.queries.Joins.all,
      graft.queries.Windows.all, graft.queries.LlmOps.all,
      graft.queries.Curation.all, graft.queries.Pipelines.all,
      graft.queries.StreamingE2e.all).flatten.map(_._1)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    // drift guard: if SparkEntry gains a module this hand-copied list
    // doesn't know, the sizes diverge and this fails readably instead of
    // the collision check silently not covering the new module
    assert(names.size == SparkEntry.queries.size,
      s"module list drifted: ${names.size} here vs " +
        s"${SparkEntry.queries.size} in SparkEntry")
  }

  test("registry invariants: oracles pair 1:1 with registered queries") {
    // an oracle without a query is dead weight the driver never compares;
    // a query without an oracle silently downgrades to the weaker
    // rows-only check — both should be deliberate, and today neither
    // exists (every registered query is hash-gated)
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val unoracled = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }

  test("fixture contract: every table loads with the dtypes the queries assume") {
    // broad regeneration canary (the events.ts lesson generalized): if the
    // driver regenerates /root/testdata with a different physical type on
    // any column the registered queries rely on, THIS fails readably
    // instead of a swath of queries failing analysis mid-board.
    import org.apache.spark.sql.types._
    val want: Seq[(String, String, DataType)] = Seq(
      ("lineitem", "l_orderkey", LongType), ("lineitem", "l_quantity", DoubleType),
      ("lineitem", "l_shipdate", TimestampNTZType), ("orders", "o_orderkey", LongType),
      ("orders", "o_orderdate", TimestampNTZType), ("customer", "c_custkey", LongType),
      ("supplier", "s_suppkey", LongType), ("part", "p_partkey", LongType),
      ("nation", "n_nationkey", IntegerType), ("region", "r_regionkey", IntegerType),
      ("documents", "doc_id", LongType), ("documents", "text", StringType),
      ("documents", "lang", StringType), ("documents", "source", StringType),
      ("embeddings", "vec_id", LongType),
      ("embeddings", "embedding", ArrayType(FloatType, containsNull = true)))
    val bad = want.flatMap { case (t, c, dt) =>
      val schema = Tables.load(spark, sfDir, t).schema
      schema.find(_.name == c) match {
        case None => Some(s"$t.$c MISSING (have: ${schema.fieldNames.mkString(",")})")
        case Some(f) if f.dataType != dt => Some(s"$t.$c is ${f.dataType}, queries assume $dt")
        case _ => None
      }
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("Tables.events yields TIMESTAMP ts on the current fixture generation") {
    // Fixture-regeneration canary: /root/testdata has shipped events.ts as
    // both TIMESTAMP(NANOS) and timestamp[us]; Tables.events must dispatch
    // on the loaded dtype and always publish a proper TimestampType column.
    // If a future regeneration changes the physical type again, THIS test
    // fails with a readable message instead of 19 queries failing analysis.
    val ev = Tables.events(spark, sfDir)
    val dt = ev.schema("ts").dataType
    assert(dt == org.apache.spark.sql.types.TimestampType,
      s"events.ts loaded as $dt — update the dtype dispatch in Tables.events")
    assert(ev.limit(1).count() == 1)
  }

  test("Bench.run emits valid JSON with a time per query, no errors") {
    val line = Bench.run(spark, sfDir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("value").asDouble() > 0)
    assert(node.get("queries").size() == SparkEntry.queries.size)
    assert(node.get("errors").size() == 0,
      s"bench errors: ${node.get("errors")}")
    val it = node.get("queries").elements()
    while (it.hasNext) assert(it.next().asDouble() >= 0)
    // the I/O bracket rides every board: both probes measured, the
    // calibration field present (-1 when no calibration is committed for
    // this working dir), the verdict a real boolean
    assert(node.get("io_sentinel").asDouble() > 0)
    assert(node.get("io_sentinel_end").asDouble() > 0)
    assert(node.has("io_calib") && node.has("io_flagged"))
  }

  test("Bench cross-reference flags injected noise vs a prior board") {
    // r14 blind spot: a host burst spanning a whole timed window (but
    // falling between the bracket probes) inflated a1_rollup 10× on two
    // committed boards with noisy:[]. The cross-reference check must
    // catch exactly that shape: a row far above its prior-round time.
    val prior = Map("a1_rollup" -> 0.30, "q_fast" -> 0.02, "q_zero" -> 0.0)
    val current = Map(
      "a1_rollup" -> 3.08, // the real r14 incident: flag
      "q_fast" -> 0.10,    // 5× but under the absolute floor: ignore
      "q_zero" -> 0.50,    // prior time 0 (unmeasurable ref): ignore
      "q_new" -> 9.99)     // not on the prior board: ignore
    assert(Bench.regressionFlags(current, prior) == Set("a1_rollup"))
    // within-1.75× drift does not flag (0.50 / 0.30 ≈ 1.67×)
    assert(Bench.regressionFlags(Map("a1_rollup" -> 0.50), prior).isEmpty)
    // the r15 silent-drift shape (the reason the trigger moved from 3× to
    // 1.75×): w11_rolling_fact read 0.755 s against a 0.406 s prior board
    // (1.86×) and the 3× trigger never re-measured it
    assert(Bench.regressionFlags(
      Map("w11_rolling_fact" -> 0.755), Map("w11_rolling_fact" -> 0.406))
      == Set("w11_rolling_fact"))
  }

  test("Bench.ioFlag adjudicates injected I/O windows against calibration") {
    // r15 blind spot: a quiet host I/O window ran every I/O-heavy row
    // 20-30% fast while the pure-CPU sentinel stayed flat, and a human
    // had to adjudicate the boards. The I/O probe must flag BOTH
    // directions of deviation from the committed calibration.
    val calib = 0.50
    assert(Bench.ioFlag(Seq(0.80, 0.52), calib), "slow window must flag")
    assert(Bench.ioFlag(Seq(0.52, 0.35), calib),
      "quiet (fast) window must flag — r15's golden a-board shape")
    assert(!Bench.ioFlag(Seq(0.45, 0.58), calib),
      "±20% band is normal machine, not a window")
    assert(!Bench.ioFlag(Seq(0.80, 0.80), -1.0),
      "no committed calibration → nothing to deviate from")
    assert(!Bench.ioFlag(Seq.empty, calib))
  }

  test("Bench.stealShare adjudicates injected hypervisor-steal windows") {
    // r16 incident: a whole sf1 board ran 27% slow with io/cpu probes in
    // tolerance because the hypervisor neighbor stole >50% of requested
    // CPU — a window that same-window re-measures cannot exonerate. The
    // steal share is demand-relative: steal/(user+nice+system+steal).
    def ticks(user: Long, sys: Long, idle: Long, steal: Long) =
      Seq(user, 0L, sys, idle, 0L, 0L, 0L, steal)
    val t0 = ticks(1000, 100, 50000, 10)
    // quiet window: 1000 user ticks, 10 steal → ~1% of demand
    assert(Bench.stealShare(t0, ticks(2000, 150, 51000, 20)) < 0.02)
    // the r16 shape: 776 user / 83 sys / 968 steal ≈ 53% of demand
    val contended = Bench.stealShare(t0,
      ticks(1000 + 776, 100 + 83, 52000, 10 + 968))
    assert(math.abs(contended - 0.53) < 0.01, s"got $contended")
    assert(Bench.stealFlag(contended * 100) && !Bench.stealFlag(1.0))
    // unmeasured stays distinguishable from quiet: -1, never flagged
    assert(Bench.stealShare(Seq.empty, Seq.empty) == -1.0)
    assert(Bench.stealShare(t0, t0) == -1.0, "zero demand → unmeasured")
    assert(!Bench.stealFlag(-100.0))
  }

  test("Bench.parseBoard reads queries + sf out of a board line") {
    val line = """{"metric":"total","value":1.5,"unit":"sec","queries":{"a":0.5,"b":1.0},"families":{"query":1.5},"errors":{},"noisy":[],"sf":"/root/testdata/sf0.1"}"""
    val (qs, sf) = Bench.parseBoard(line)
    assert(qs == Map("a" -> 0.5, "b" -> 1.0))
    assert(sf == "/root/testdata/sf0.1")
  }
}
