package graft

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Failures are recorded as -1 with an "errors" map —
  * a broken query must never masquerade as a fast one.
  */
object Bench {

  def run(spark: SparkSession, sfDir: String,
      only: Set[String] = Set.empty): String = {
    // STEAL SENTINEL (r16): the r16 sf1 a-board ran 27% slow with BOTH
    // probes inside tolerance and 25 rows "regressed" — because the
    // hypervisor neighbor was stealing >50% of requested CPU for the
    // whole board, a window the CPU sentinel's re-measures can't
    // exonerate (they re-measure inside the same window) and the I/O
    // probe only brushes. /proc/stat's steal counter measures it
    // DIRECTLY: bracket the whole board and report stolen ticks as a
    // share of CPU demand (user+nice+system+steal). Needs no committed
    // calibration — quiet KVM hosts run 0-2%; the r16 incident measured
    // 53% under a controlled burn. Absent counter (non-KVM, non-Linux)
    // reports -1, never 0: "unmeasured" must stay distinguishable from
    // "measured quiet".
    val stealTicks0 = procStatTicks()
    // warm-up: exercise the scan/join/agg/window/regexp codegen paths once
    // so JVM + whole-stage-codegen compilation isn't billed to whichever
    // measured query happens to run first
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      Seq("documents", "embeddings", "customer", "events").foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () } // events needs nanosAsLong; set in configure
      }
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("o_orderpriority"))
            .orderBy(col("o_orderpriority"))))
        .filter(regexp_extract(col("o_orderpriority"), "(\\d)", 1) =!= "9")
        .write.format("noop").mode("overwrite").save()
      // exercise the object-aggregate + higher-order-function paths the
      // similarity queries use (collect_list, aggregate/zip_with/transform,
      // explode) — their first-use interpreter/codegen setup costs seconds
      // and belongs to the JVM, not to whichever query runs first
      o.limit(1000)
        .select(col("o_orderkey") % 7 as "g",
          expr("transform(sequence(0, 11), j -> md5(concat(CAST(j AS STRING), o_orderpriority)))").as("hs"))
        .groupBy("g")
        .agg(expr("""aggregate(collect_list(hs), array_repeat('g', 12),
                     (acc, x) -> zip_with(acc, x, (a, b) -> least(a, b)))""").as("mhs"))
        .select(col("g"), explode(col("mhs")))
        .write.format("noop").mode("overwrite").save()
    }
    // NOISE SENTINEL (r14): two boards in a row needed post-hoc isolated
    // re-measures because host-level neighbors inflated mid-board rows
    // 2-8× (r12: j3/llm_tfidf_terms; r13: the sf1 a-board). The board now
    // adjudicates ITSELF: a fixed CPU-bound probe (parallel sum over
    // spark.range, all cores, no I/O, no state) is calibrated once after
    // warm-up (min of 5), then bracket-measured around every query's timed
    // window. A window whose sentinel drifts past the noise bar is host
    // noise by construction — the probe's own cost is constant — so the
    // query is re-measured (up to 2 extra attempts); a row that never gets
    // a clean window keeps its MIN across attempts and is named in the
    // JSON "noisy" list instead of in a human footnote.
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 256L << 20, 1, spark.sparkContext.defaultParallelism)
        .selectExpr("sum(id % 2654435761)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val sentinel0 = (1 to 5).map(_ => sentinel()).min
    def quiet(s: Double): Boolean =
      s <= math.max(sentinel0 * 1.5, sentinel0 + 0.05)
    // I/O SENTINEL (r16): the CPU probe above is BLIND to I/O windows —
    // the r15 mid-round boards rode a 20-30% quiet disk window with the
    // CPU sentinel flat at 0.109-0.155 s, and a human had to adjudicate
    // boards after the fact (second round running: r14's a1_rollup was
    // the same class). This probe is the I/O-side twin: a fixed-size
    // parquet write+read of incompressible longs (xxhash64 of ids —
    // pseudorandom, so delta/dictionary encoding can't shrink it; one
    // hash per value keeps CPU out of the measurement) against the
    // real disk (java.io.tmpdir, NOT spark.local.dir which is tmpfs
    // here). It brackets the BOARD — min-of-3 after warm-up, min-of-3
    // after the last query — and both values are compared against a
    // COMMITTED calibration (artifacts/bench_calibration.json, or
    // SPARK_GRAFT_IO_CALIB): a probe >20% off calibration in EITHER
    // direction marks the whole board "io_flagged" in the JSON. Fast
    // deviations flag too — the r15 incident was a QUIET window making
    // the code look better than it is, not a noisy one making it look
    // worse.
    val ioDir = java.nio.file.Files.createTempDirectory("graft_io_probe")
    def ioSentinel(): Double = {
      val out = ioDir.resolve("probe.parquet").toString
      val t0 = System.nanoTime()
      spark.range(0L, 4L << 20, 1, 8).selectExpr(
          "xxhash64(id) AS a", "xxhash64(id, 1) AS b",
          "xxhash64(id, 2) AS c", "xxhash64(id, 3) AS d")
        .write.mode("overwrite").parquet(out)
      // sum of a MODULO, not of the raw hashes: 4M pseudorandom longs
      // overflow an ANSI-mode sum; the modulo keeps the read-back forced
      // (count(*) alone would answer from parquet footers without
      // touching a data page) while the accumulator stays bounded
      spark.read.parquet(out).selectExpr("sum(a % 65536)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // two discarded warm probes first: the initial parquet writes pay
    // writer-path JIT (~40% measured on an otherwise-quiet host) that
    // belongs to the JVM, not to the window — the board's own per-query
    // warm-pass rule applied to the probe itself. Probe SIZE is a
    // measured tradeoff: at 512 MB the probe fights its own dirty-page
    // writeback (±25% self-noise); 128 MB writes clear the page cache
    // without saturating it.
    ioSentinel(); ioSentinel()
    val ioSentinel0 = (1 to 3).map(_ => ioSentinel()).min
    // a slow probe gets one settle-and-retry before it counts as drift:
    // the heavy stateful rows (RocksDB e2e, localCheckpoint pipelines)
    // leave decaying JVM residue (async GC finalization, store cleanup)
    // that a 300 ms settle absorbs, while genuine host-noise windows last
    // seconds-to-minutes and stay slow through the retry
    def probe(): Double = {
      val s = sentinel()
      if (quiet(s)) s else { Thread.sleep(300); math.min(s, sentinel()) }
    }
    // SPARK_GRAFT_PASSES=1 is the scale-probe mode (sf10 pair-blowup
    // rows, minutes per execution): no warm pass, no noise re-measures —
    // one execution IS the artifact, and the JSON labels itself with
    // "passes" so a single-pass board can never masquerade as a
    // min-of-two canonical one. Default (2) keeps the warm + min-of-two
    // + sentinel-re-measure protocol unchanged.
    val passes = sys.env.get("SPARK_GRAFT_PASSES")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ > 0).getOrElse(2)
    val noisy = scala.collection.mutable.ArrayBuffer[String]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // intra-query materializations (LSH/minhash self-join sides) are
    // measured inside each run; dropping them between passes keeps runs
    // independent. clearCache() covers Dataset.cache(); the
    // localCheckpoint blocks those queries use live in the BlockManager
    // as persisted RDDs, which only ContextCleaner would free on a
    // driver GC — unpersist them explicitly so 100+ queries' blocks
    // don't pile up
    def clear(): Unit = {
      spark.catalog.clearCache()
      // blocking: async removal of a big query's checkpoint blocks is a
      // BlockManager removal STORM that otherwise overlaps the NEXT timed
      // run — measured as 2-8x swings on the localCheckpoint-heavy rows
      // (j3, corpus_report, dedup_apply) across same-code boards at sf1.
      // Cleanup cost belongs between measurements, not inside them.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // ContextCleaner frees dead shuffle files/broadcasts only when the
      // driver GC collects their references; across 100+ queries in one
      // JVM they otherwise pile up in spark.local.dir (tmpfs here — RAM)
      // and late queries inflate 2-4x vs isolated runs. One explicit GC
      // per query (~10 ms under ParallelGC at this heap) keeps every
      // measurement starting from the same clean slate.
      System.gc()
    }
    val fnByName = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    fnByName.foreach { case (name, fn) =>
      def once(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      try {
        // per-query WARM pass, then MIN of two measured runs: the warm
        // pass absorbs per-query first-touch costs (parquet footer reads,
        // codegen compilation, lambda interpreter setup — r7: w5_upsample
        // 1.93 s driver vs 0.31 s re-run of the same binary), and the min
        // absorbs the residual jitter driver runs still showed after it
        // (r9: llm_span_dedup 3.59 s driver vs 0.57 s locally — a JIT
        // deopt/GC landing inside the single measured pass). Min, not
        // mean: the floor is the reproducible cost of the plan; anything
        // above it is the JVM, not the query.
        if (passes >= 2) { once(); clear() }
        def attempt(): Double = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          once()
          val dt = (System.nanoTime() - t0) / 1e9
          clear(); dt
        }.min
        // bracket the timed window with the sentinel: clean before AND
        // after → the window was quiet, accept; else re-measure (the min
        // across attempts still stands if no attempt gets a quiet window).
        // Single-pass mode brackets but never re-measures.
        // The window is ALSO bracketed by /proc/stat steal samples
        // (r16): hypervisor-steal waves last minutes, so a full board
        // can never dodge them — but each QUERY only needs a clean
        // window of seconds. Three consecutive sf1 boards on a wave-y
        // host came back 183-205 s with 22-33% board steal where the
        // quiet-window value is ~160 s, with the CPU bracket blind to
        // most of it (steal hits the measured run and the probe
        // equally, so the probe still reads "quiet" RELATIVE to its
        // own stolen calibration). A steal-dirty window re-measures
        // exactly like a sentinel-dirty one; unmeasured hosts (-1)
        // never re-measure.
        var best = Double.MaxValue
        var clean = false
        var tries = 0
        val maxTries = if (passes >= 2) 3 else 1
        while (!clean && tries < maxTries) {
          val s1 = probe()
          val st0 = procStatTicks()
          val t = attempt()
          val stealOk = !stealFlag(stealShare(st0, procStatTicks()) * 100)
          val s2 = probe()
          best = math.min(best, t)
          clean = quiet(s1) && quiet(s2) && stealOk
          tries += 1
        }
        if (!clean) noisy += name
        results(name) = best
      } catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        results(name) = -1.0
      } finally clear()
    }
    // CROSS-REFERENCE RE-MEASURE (r15): the bracket sentinel has a blind
    // spot — a host burst that spans the whole timed window but falls
    // between the two probes passes as "quiet" (r14's a1_rollup: 3.08 s
    // on two committed boards with noisy:[], real value 0.30 s). A prior
    // board at the SAME sf sees what the bracket can't: any row now
    // >1.75× its prior-round time (above an absolute floor, so micro-rows
    // don't thrash) gets up to two fresh measured windows, the min stands, and
    // a row whose regression SURVIVES re-measurement is named in a
    // dedicated "regressed" JSON field — a stable slow value is a real
    // regression to adjudicate, not noise, so it must not hide in
    // "noisy". Single-pass scale-probe boards skip this (one execution
    // IS the artifact).
    val refBoard = if (passes >= 2) referenceBoard(sfDir) else Map.empty[String, Double]
    val regressed = scala.collection.mutable.ArrayBuffer[String]()
    if (refBoard.nonEmpty) {
      val flagged = regressionFlags(
        results.toMap.filter(_._2 >= 0), refBoard)
      flagged.toSeq.sorted.foreach { name =>
        val fn = fnByName.toMap.apply(name)
        def once(): Unit =
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        var best = results(name)
        // the regression verdict deserves 2 STEAL-CLEAN fresh windows:
        // a re-measure landing inside a hypervisor-steal wave would
        // confirm the "regression" the wave itself caused. Dirty
        // windows don't consume the clean-window budget (their min
        // still counts — a fast value under steal is a fortiori
        // clean), bounded by a hard attempt cap so a fully-stolen
        // host terminates.
        var cleanExtra = 0
        var extra = 0
        while (cleanExtra < 2 && extra < 6 && regressionFlags(
            Map(name -> best), refBoard).nonEmpty) {
          val st0 = procStatTicks()
          val t0 = System.nanoTime()
          once()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
          if (!stealFlag(stealShare(st0, procStatTicks()) * 100))
            cleanExtra += 1
          clear()
          extra += 1
        }
        results(name) = best
        if (regressionFlags(Map(name -> best), refBoard).nonEmpty)
          regressed += name
      }
    }
    // closing I/O bracket + board adjudication against the committed
    // calibration; the probe dir is deleted so repeated boards don't
    // accumulate 128 MB probe files in /tmp
    val ioSentinel1 = (1 to 3).map(_ => ioSentinel()).min
    locally {
      import java.nio.file.Files
      Files.walk(ioDir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
    }
    val stealPct = stealShare(stealTicks0, procStatTicks()) * 100
    // start and end probes carry SEPARATE calibrations: after a full
    // board (~190 queries) the JVM runs the probe ~20% faster than at
    // board start (deep C2 compilation of the parquet writer path, hot
    // page cache) — measured 0.52-0.57 end vs 0.61-0.82 start on quiet
    // full boards. One shared calibration would read normal end-of-board
    // warmth as a quiet window.
    val (ioCalib, ioCalibEnd) = ioCalibration()
    val ioFlagged = ioFlag(Seq(ioSentinel0), ioCalib) ||
      ioFlag(Seq(ioSentinel1), ioCalibEnd)
    def jq(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val qs = results.map { case (k, v) => jq(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => jq(k) + ":" + jq(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // family sub-aggregates so the headline tracks plan quality instead
    // of fixture/stream-startup floors as those families grow:
    //  - streaming_e2e: real readStream micro-batch runs (fixed startup
    //    + state-commit floors dominate at test scale)
    //  - fixture_e2e:   end-to-end rows that write their own fixtures /
    //    sinks inside the measurement (write cost is the point, but it
    //    is not scan-plan cost)
    //  - query:         everything else — the plan-quality number
    // anchored suffix match (r16, was contains): `_e2e` plus an optional
    // twin digit at END of name — covers pipeline_esios_e2e2 /
    // pipeline_omie_mic_e2e2 (the r15 fix) without the contains() hazard
    // of a future "..._e2e_..." mid-name query row silently billing to
    // fixture_e2e (ADVICE r15). Mirrored in tools/bench_compare.py.
    def family(n: String): String =
      if (n.contains("stream")) "streaming_e2e"
      else if ("_e2e\\d*$".r.findFirstIn(n).isDefined) "fixture_e2e"
      else "query"
    // toSeq first: a pair-producing collect on a Map would collapse
    // same-family entries to the last one instead of keeping all rows
    val fams = results.toSeq.collect { case (k, v) if v >= 0 => (family(k), v) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (f, vs) => jq(f) + ":" + f"${vs.map(_._2).sum}%.3f" }
      .mkString("{", ",", "}")
    val ns = noisy.map(jq).mkString("[", ",", "]")
    val rs = regressed.map(jq).mkString("[", ",", "]")
    val io = f""""io_sentinel":$ioSentinel0%.3f,"io_sentinel_end":$ioSentinel1%.3f,"io_calib":$ioCalib%.3f,"io_calib_end":$ioCalibEnd%.3f,"io_flagged":$ioFlagged"""
    val steal = f""""steal_pct":$stealPct%.1f,"steal_flagged":${stealFlag(stealPct)}"""
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"families":$fams,"errors":$es,"noisy":$ns,"regressed":$rs,"sentinel":${f"$sentinel0%.3f"},$io,$steal,"passes":$passes,"sf":"$sfDir"}"""
  }

  /** Board-level I/O-window adjudication: flagged when any bracket probe
    * deviates from the committed calibration by more than `tol` in EITHER
    * direction (a quiet window flatters the code exactly as a loud one
    * slanders it — r15's golden a-board was a FAST window). No committed
    * calibration (calib <= 0) → never flagged: a fresh host has nothing
    * to deviate from. Pure — unit-tested with injected windows in
    * ContractSpec.
    */
  private[graft] def ioFlag(measured: Seq[Double], calib: Double,
      tol: Double = 0.2): Boolean =
    calib > 0 && measured.exists(m => m > 0 && math.abs(m - calib) / calib > tol)

  /** Stolen share of the board's CPU DEMAND from bracketing /proc/stat
    * samples: steal / (user+nice+system+steal). Demand-relative, not
    * machine-relative — a local[4] board on a 32-cpu host leaves 28 cpus
    * idle, so steal as a fraction of the whole machine would read 3%
    * while the board's own threads lose half their cycles (the r16 sf1
    * incident: 9.7 s steal vs 7.8 s user under an 8-thread burn = 53%
    * of demand, 3% of machine). Tick layout per proc(5): user nice
    * system idle iowait irq softirq steal. Returns -1 when the counter
    * is unavailable or nothing ran between samples. Pure — unit-tested
    * with injected tick vectors in ContractSpec.
    */
  private[graft] def stealShare(start: Seq[Long], end: Seq[Long]): Double = {
    if (start.length < 8 || end.length < 8) -1.0
    else {
      val d = end.zip(start).map { case (e, s) => math.max(e - s, 0L) }
      val demand = d(0) + d(1) + d(2) + d(7)
      if (demand <= 0) -1.0 else d(7).toDouble / demand
    }
  }

  /** Quiet KVM guests measure 0-2% demand-relative steal; a contended
    * hypervisor neighbor is tens of percent (53% in the r16 incident).
    * 10% is daylight between the two regimes. -1 (unmeasured) never
    * flags — absence of evidence is reported as -1, not adjudicated.
    */
  private[graft] def stealFlag(stealPct: Double, tolPct: Double = 10.0): Boolean =
    stealPct > tolPct

  /** First line of /proc/stat as tick counters, empty when unreadable
    * (non-Linux, sandboxed). Read via Files.readAllLines: /proc files
    * report size 0, which trips streaming readers that pre-size on it.
    */
  private def procStatTicks(): Seq[Long] =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      line.trim.split("\\s+").toSeq.drop(1).map(_.toLong)
    } catch { case _: Exception => Seq.empty }

  /** The committed I/O calibrations (board-start, board-end) for this
    * host: SPARK_GRAFT_IO_CALIB (a path) if set, else
    * artifacts/bench_calibration.json under the working directory. Shape:
    * {"io_sentinel": <sec>, "io_sentinel_end": <sec>, ...}; a missing
    * end value falls back to the start value. Missing or unparsable file
    * → (-1, -1): boards run unflagged but carry io_calib:-1, so a
    * calibration-less board is visibly weaker evidence, not silently
    * identical.
    */
  private def ioCalibration(): (Double, Double) =
    try {
      import java.nio.file.{Files, Paths}
      val p = sys.env.get("SPARK_GRAFT_IO_CALIB").map(Paths.get(_))
        .getOrElse(Paths.get("artifacts/bench_calibration.json"))
      if (!Files.isRegularFile(p)) (-1.0, -1.0)
      else {
        val text = Files.readString(p)
        def field(name: String): Option[Double] =
          (""""""" + name + """"\s*:\s*(-?[0-9][0-9.eE+-]*)""").r
            .findFirstMatchIn(text)
            .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)
        val start = field("io_sentinel").getOrElse(-1.0)
        (start, field("io_sentinel_end").getOrElse(start))
      }
    } catch { case _: Exception => (-1.0, -1.0) }

  /** Rows whose current time is >`factor`× the reference board's time for
    * the same query AND above an absolute floor (micro-rows jitter across
    * boards without meaning anything). Pure — unit-tested with injected
    * noise in ContractSpec.
    *
    * factor 1.75 (r16, was 3.0): w11_rolling_fact (1.86×) and w31_twap
    * (1.5×) drifted under the 3× bar on the r15 driver board and
    * `regressed` stayed silent about them. 1.75 is the re-MEASURE
    * trigger, not the accusation: a tripped row gets up to two fresh
    * measured windows and only a drift that SURVIVES re-measurement is
    * named — the fresh windows are the same-round second opinion that
    * separates window noise (re-measures back down) from a real
    * regression (stays slow).
    */
  private[graft] def regressionFlags(current: Map[String, Double],
      reference: Map[String, Double], factor: Double = 1.75,
      floorSec: Double = 0.25): Set[String] =
    current.collect { case (n, t)
        if t >= floorSec &&
           reference.get(n).exists(r => r > 0 && t > r * factor) => n
    }.toSet

  /** Parse a prior board's queries map + sf tag out of our own one-line
    * JSON shape (flat string keys to numbers inside "queries":{...} — a
    * targeted regex, not a JSON lib, because the bench classpath is Spark
    * plus nothing).
    */
  private[graft] def parseBoard(json: String): (Map[String, Double], String) = {
    val body = """"queries"\s*:\s*\{(.*?)\}""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val pair = """"((?:[^"\\]|\\.)+)"\s*:\s*(-?[0-9][0-9.eE+-]*)""".r
    val qs = pair.findAllMatchIn(body)
      .flatMap(m => scala.util.Try(m.group(1) -> m.group(2).toDouble).toOption)
      .toMap
    val sf = """"sf"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    (qs, sf)
  }

  /** The prior-round board to cross-reference: SPARK_GRAFT_REF_BENCH if
    * set, else the most recently modified matching board from the
    * working directory — `artifacts/bench_local_*.json` (our own
    * committed one-line boards, preferred) and `BENCH_r*.json` (the
    * driver's wrapper, whose payload arrives with escaped quotes and may
    * be tail-truncated — unescaping lets a complete payload parse; a
    * truncated one yields no queries marker and is skipped). A board is
    * ignored unless its sf tag names the same sf directory — comparing
    * an sf1 run against an sf0.1 board would flag everything.
    */
  private def referenceBoard(sfDir: String): Map[String, Double] =
    try {
      import java.nio.file.{Files, Paths, Path}
      val base = (s: String) =>
        s.split('/').filter(_.nonEmpty).lastOption.getOrElse(s)
      def boardOf(p: Path): Map[String, Double] = {
        val text = Files.readString(p).replace("\\\"", "\"")
        val (qs, sf) = parseBoard(text)
        if (qs.nonEmpty && base(sf) == base(sfDir)) qs
        else Map.empty[String, Double]
      }
      sys.env.get("SPARK_GRAFT_REF_BENCH").map(Paths.get(_))
        .filter(Files.isRegularFile(_)).map(boardOf).getOrElse {
          val cwd = Paths.get(".").toAbsolutePath.normalize
          val dirs = Seq(cwd.resolve("artifacts"), cwd)
          val candidates = dirs.filter(Files.isDirectory(_)).flatMap { d =>
            Files.list(d).iterator().asScala.filter { p =>
              val n = p.getFileName.toString
              n.matches("bench_local_.*\\.json") || n.matches("BENCH_r\\d+\\.json")
            }.toSeq
          }.sortBy(p => -Files.getLastModifiedTime(p).toMillis)
          candidates.iterator.map(boardOf).find(_.nonEmpty)
            .getOrElse(Map.empty)
        }
    } catch { case _: Exception => Map.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // builder-side iteration aid: SPARK_GRAFT_ONLY=q1,q2 times a subset;
    // the driver never sets it, so the contract surface is unchanged
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val json = run(spark, sfDir, only)
    spark.stop()
    // Also persist the JSON to a well-known file: when run through sbt,
    // stdout unavoidably gains sbt's own [info]/[success] framing lines, so
    // a stdout-only contract leaves the consumer tail-scraping. The file is
    // the framing-free artifact. Override the path with SPARK_GRAFT_BENCH_OUT.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // the ONLY stdout this program emits, printed after spark.stop() so no
    // shutdown message can land behind it — the driver parses stdout for
    // one bare JSON line (BENCH_r05 "parsed": null came from log noise)
    System.out.flush()
    println(json)
    System.out.flush()
  }
}
