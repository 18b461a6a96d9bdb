package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import scala.collection.mutable

/** Exact interpolated quantiles WITHOUT the linear-memory value buffer of
  * `percentile()` — the one aggregate in the surface whose executor memory
  * grows with the data (Spark's Percentile holds a value→count map per
  * partition and merges them; at 10^12 rows of a high-cardinality double
  * that map IS the dataset). Two scale-safe exact strategies instead:
  *
  *  - [[percentiles]] (global, unbounded domain): iteratively refined
  *    histogram brackets. Pass 1 computes (n, min, max); each refinement
  *    pass histograms the current bracket into `bins` equal-width bins
  *    (one column scan, ≤`bins` result rows), walks the cumulative counts
  *    to the bin holding the target rank, and narrows the bracket to that
  *    bin; a bracket whose population fits `leafLimit` is resolved exactly
  *    from its sorted value counts. Executor memory is O(bins) per task,
  *    driver traffic is O(bins + leafLimit) rows per pass — independent of
  *    n. Range shrinks `bins`× per pass, so 10^12 uniform rows resolve in
  *    3 passes; the ulp guard below bounds the pathological case. Each
  *    pass carries a value-range conjunct, so parquet min/max stats prune
  *    row groups on the narrowed re-scans.
  *
  *  - [[grouped]] (per group, bounded-cardinality domain — token counts,
  *    fixed-precision decimals): shrink to exact value counts first
  *    (groupBy(keys, v)), then rank within each group with a cumulative
  *    window over the DISTINCT values and select/interpolate the target
  *    ranks in one aggregation. Fully distributed — nothing is collected;
  *    memory is bounded by the sort-based window over distinct values.
  *
  * Both reproduce `percentile()` / DuckDB `quantile_cont` BIT-EXACTLY:
  * exact selection returns the same order statistics, and the
  * interpolation below is the same expression Spark's Percentile
  * evaluates — `(higher − pos) · v_lo + (pos − lower) · v_hi` with the
  * `higher == lower` short-circuit (the naive `v_lo + frac · (v_hi −
  * v_lo)` differs in the last ulp, which a round-to-6 gate can expose).
  * Nulls are excluded, as percentile() does.
  */
object Quantiles {

  /** Exact interpolated per-group quantiles via value counts. Returns one
    * row per group: `keys ++ names` (quantile columns as doubles, in ps
    * order). `value` should be cast to double by the caller for bit parity
    * with percentile(). Groups whose values are all null are absent.
    */
  def grouped(df: DataFrame, keys: Seq[String], value: String,
      ps: Seq[Double], names: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == names.length,
      "one output name per quantile")
    groupedFromCounts(
      df.filter(col(value).isNotNull)
        .groupBy((keys.map(col) :+ col(value)): _*)
        .agg(count(lit(1)).as("__cnt")),
      keys, value, "__cnt", ps, names)
  }

  /** [[grouped]] over PRE-AGGREGATED value counts — one row per
    * (keys, value) with its occurrence count in `cnt`. Callers that
    * already hold the value-counts grain (e.g. a stats row computing
    * count/mean AND quantiles from one groupBy) skip the second source
    * scan this method would otherwise pay. NULL values must already be
    * excluded.
    *
    * `extra` rides companion aggregates on the SAME final aggregation
    * (one (name, aggExpr) pair per output column), so a stats row needing
    * count/mean alongside the quantiles stays ONE job instead of
    * checkpoint + two branches + join — at small scale each extra Spark
    * job is a fixed ~0.15-0.3 s floor, and at cluster scale each is a
    * scheduling round-trip. The expressions aggregate rows of the
    * cumulative frame: one row per (keys, value) carrying `cnt` as
    * `__cnt` plus the window columns `__n` (group total) and `__cum`
    * (cumulative count in value order). Counts-grain identities hold
    * exactly: sum(__cnt) is the row count and sum(value·__cnt)/sum(__cnt)
    * is bit-equal to avg over raw rows whenever value is integer-valued
    * (integer-valued double sums are exact below 2^53 in any order).
    */
  def groupedFromCounts(counts: DataFrame, keys: Seq[String], value: String,
      cnt: String, ps: Seq[Double], names: Seq[String],
      extra: Seq[(String, Column)] = Nil): DataFrame = {
    require(ps.nonEmpty && ps.length == names.length,
      "one output name per quantile")
    val v = col(value)
    val byKeys = Window.partitionBy(keys.map(col): _*)
    val cum = counts
      .withColumn("__cnt", col(cnt))
      .withColumn("__n", sum(col("__cnt")).over(byKeys))
      .withColumn("__cum", sum(col("__cnt")).over(byKeys.orderBy(v)))
    // 0-indexed target rank r = p·(n−1); the distinct value whose
    // cumulative span covers rank k is the one with cum−cnt ≤ k < cum
    val aggCols = ps.indices.flatMap { i =>
      val r = lit(ps(i)) * (col("__n") - 1).cast(DoubleType)
      val kl = floor(r); val kh = ceil(r)
      Seq(
        max(when(col("__cum") - col("__cnt") <= kl && kl < col("__cum"), v))
          .as(s"__vl_$i"),
        max(when(col("__cum") - col("__cnt") <= kh && kh < col("__cum"), v))
          .as(s"__vh_$i"),
        max(r).as(s"__r_$i"))
    } ++ extra.map { case (n, c) => c.as(n) }
    val sel = keys.map(col) ++ ps.indices.map { i =>
      val r = col(s"__r_$i"); val kl = floor(r); val kh = ceil(r)
      when(kl === kh, col(s"__vl_$i").cast(DoubleType))
        .otherwise(
          (kh.cast(DoubleType) - r) * col(s"__vl_$i") +
            (r - kl.cast(DoubleType)) * col(s"__vh_$i"))
        .as(names(i))
    } ++ extra.map { case (n, _) => col(n) }
    cum.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      .select(sel: _*)
  }

  /** Exact interpolated global quantiles of `value` at probabilities `ps`,
    * driver-coordinated histogram-bracket selection (doc above). The
    * returned doubles are bit-identical to `percentile(value, p)`.
    *
    * `reuse` (default on) persists the projected single-double column for
    * the duration of the call, so the stats pass + every refinement pass
    * share ONE source read instead of re-decoding parquet per pass — the
    * 3-4× constant factor the r11 bench flagged on a11_winsorize. Cached
    * batches keep min/max stats, so narrowed passes still prune in-memory
    * partitions the way the uncached arm prunes row groups. Set it false
    * when the column exceeds the cluster's cache budget (the extreme-scale
    * arm — then each pass's range conjunct reaches the parquet reader and
    * row-group stats do the pruning; QuantilesSpec audits that path).
    */
  def percentiles(df: DataFrame, value: String, ps: Seq[Double],
      bins: Int = 4096, leafLimit: Long = 1L << 16,
      reuse: Boolean = true): Seq[Double] = {
    val base0 = projected(df, value)
    val base = if (reuse)
      base0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else base0
    try percentilesPrepared(base, ps, bins, leafLimit)
    finally if (reuse) base.unpersist(blocking = false)
  }

  /** The single-double-column projection every pass of the machinery
    * scans: callers composing SEVERAL quantile rounds over one column
    * (MAD, winsorize, spike thresholds, approx-vs-exact gates) should
    * `prepared(...)` this ONCE and hand it to [[percentilesPrepared]] /
    * [[statsOf]] — otherwise each round re-decodes the source parquet,
    * the 3-4× constant factor the r12 sf1 bench measured on a14/a19.
    */
  def projected(df: DataFrame, value: String): DataFrame =
    df.select(col(value).cast(DoubleType).as("__v"))
      .filter(col("__v").isNotNull)

  /** [[projected]], persisted for cross-round reuse. The caller owns the
    * unpersist (or leaves it to the harness's between-query cleanup when
    * the RETURNED frame still references the cache).
    */
  def prepared(df: DataFrame, value: String): DataFrame =
    projected(df, value)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** One (count, min, max) pass over a [[projected]] frame — the stats
    * that seed the bracket machinery. Exposed so multi-round callers can
    * DERIVE the next round's bounds instead of paying a fresh stats scan:
    * |x − med| over x ∈ [mn, mx] is bounded by [0, max(mx−med, med−mn)]
    * (IEEE subtraction is monotone), and the row count is unchanged by a
    * null-free narrow map.
    */
  def statsOf(base: DataFrame): (Long, Double, Double) = {
    val st = base.agg(count(lit(1)), min(col("__v")), max(col("__v"))).head()
    val n = st.getLong(0)
    require(n > 0, "percentile of empty input")
    val mn = st.getDouble(1); val mx = st.getDouble(2)
    // Spark orders NaN above every double, so max() surfaces any NaN in
    // the column; ±Inf surfaces as the min/max itself. Neither has a
    // cross-engine percentile semantics worth chasing (DuckDB and Spark
    // already disagree on them), and both would poison the bracket
    // arithmetic — reject loudly instead of returning garbage.
    require(!mx.isNaN && !mn.isInfinity && !mx.isInfinity,
      s"percentiles: non-finite values in the column (min=$mn, max=$mx) — " +
        "filter NaN/Inf out first; their ordering is engine-specific")
    (n, mn, mx)
  }

  /** Exact interpolated quantiles over a [[projected]] (ideally
    * [[prepared]]) frame, minimum job count: the 2-job log-bucket arm
    * ([[Winsorize.exactQuantiles]] — stats-free histogram + one tagged
    * leaf scan) whenever the data allows, else the refine-until-leafLimit
    * machinery below. Bit-identical results in both arms (same order
    * statistics, same interpolation expression).
    */
  def exact(base: DataFrame, ps: Seq[Double]): Seq[Double] =
    Winsorize.exactQuantiles(base, ps).map(_._1)
      .getOrElse(percentilesPrepared(base, ps))

  /** [[exact]] over a named column. No persist: at two scans, building
    * the in-memory columnar cache measures ~2× the cost of the second
    * pruned-column decode (r13 probe at sf1).
    */
  def exactCol(df: DataFrame, value: String, ps: Seq[Double]): Seq[Double] =
    exact(projected(df, value), ps)

  /** Exact interpolated quantiles over a [[projected]] (ideally
    * [[prepared]]) frame. `known` short-circuits the stats pass with
    * bounds the caller already holds — they need NOT be tight (loose
    * bounds only waste empty histogram bins), but must contain every
    * value, count exactly, and be finite.
    */
  def percentilesPrepared(base: DataFrame, ps: Seq[Double],
      bins: Int = 4096, leafLimit: Long = 1L << 16,
      known: Option[(Long, Double, Double)] = None): Seq[Double] = {
    require(ps.forall(p => p >= 0 && p <= 1), "p in [0,1]")
    require(bins >= 2 && bins <= (1 << 20),
      "bins in [2, 2^20] (bin ids must stay exactly double-representable)")
    val (n, mn, mx) = known.getOrElse(statsOf(base))
    val ranks = ps.flatMap { p =>
      val pos = p * (n - 1)
      Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
    }.distinct
    val at = valuesAtRanks(base, n, mn, mx, ranks, bins, leafLimit)
    ps.map { p =>
      val pos = p * (n - 1)
      val lo = math.floor(pos).toLong; val hi = math.ceil(pos).toLong
      if (lo == hi) at(lo)
      else (hi - pos) * at(lo) + (pos - lo) * at(hi) // Percentile's formula
    }
  }

  /** Bracket state: `pred` selects EXACTLY this bracket's rows (membership
    * is the conjunction of the bin-assignment expressions that produced
    * it — never a re-derived float range, which can disagree at bin edges
    * by one ulp); [lo, hi] is the value range (for bin arithmetic and the
    * pushdown-friendly range conjunct); `offset` is the 0-indexed rank
    * within the bracket; `cnt` its exact population.
    */
  private final case class Bracket(
      pred: Column, lo: Double, hi: Double, offset: Long, cnt: Long)

  /** Per-bin width, overflow-safe: (hi − lo) exceeds Double.MaxValue when
    * a bracket spans huge values of both signs, so divide endpoints first
    * in that regime. Finite whenever lo/hi are (which percentiles()
    * enforces).
    */
  private def width(lo: Double, hi: Double, bins: Int): Double = {
    val r = hi - lo
    if (r.isInfinity) hi / bins - lo / bins else r / bins
  }

  /** Bin edge `lo + w·bin` without the w·bin overflow on astronomically
    * wide brackets (endpoint interpolation keeps every intermediate
    * within ±max(|lo|, |hi|)).
    */
  private def edge(lo: Double, hi: Double, bins: Int, bin: Long): Double =
    if ((hi - lo).isInfinity) lo / bins * (bins - bin) + hi / bins * bin
    else lo + (hi - lo) / bins * bin

  /** The bin-assignment expression for a bracket. In the overflow regime
    * (v − lo) is as unsafe as (hi − lo), so the division distributes;
    * otherwise the plain form (numerically tighter once brackets are
    * narrow — the dominant case after pass 1). Only internal consistency
    * matters: the SAME expression assigns the histogram bin and later
    * selects the bin's members, so rounding can never disagree with
    * itself.
    */
  private def binExpr(v: Column, b: Bracket, bins: Int): Column = {
    val w = width(b.lo, b.hi, bins)
    val raw =
      if ((b.hi - b.lo).isInfinity) floor(v / w - b.lo / w)
      else floor((v - b.lo) / w)
    least(greatest(raw, lit(0L)), lit((bins - 1).toLong)).cast(IntegerType)
  }

  private def valuesAtRanks(base: DataFrame, n: Long, mn: Double,
      mx: Double, ranks: Seq[Long], bins: Int, leafLimit: Long)
      : Map[Long, Double] = {
    val v = col("__v")
    val out = mutable.Map[Long, Double]()
    var active: Seq[(Long, Bracket)] = ranks.map { k =>
      require(k >= 0 && k < n, s"rank $k out of [0, $n)")
      k -> Bracket(v >= mn && v <= mx, mn, mx, k, n)
    }
    var pass = 0
    while (active.nonEmpty) {
      pass += 1
      // a bracket leafs when its population collects safely, when every
      // value is identical, or when a bin narrows below one ulp (the
      // histogram can no longer split it, but then it holds ≤ bins+1
      // distinct doubles, so the distinct-leaf stays bounded); the pass
      // cap is a pure backstop — the range shrinks bins× per pass, so 40
      // passes out-divide the entire double dynamic range
      val (leaf, refine) = active.partition { case (_, b) =>
        b.cnt <= leafLimit || b.lo == b.hi || pass > 40 ||
          width(b.lo, b.hi, bins) <=
            math.ulp(math.max(math.abs(b.lo), math.abs(b.hi)))
      }
      // brackets for nearby ranks coincide (p01's floor/ceil ranks, both
      // tails on the first pass) — dedup them; DISTINCT brackets are
      // pairwise disjoint by construction (identical parents dedup, and
      // children of one parent are different bins), so EVERY bracket at
      // this pass — leaf value-counts and refinement histograms alike —
      // shares ONE tagged scan, keyed by the value for leaf tags and the
      // (exactly double-representable) bin id for refine tags: at 100 TB
      // a pass costs one column read however many quantiles are in
      // flight and whatever stage each has reached.
      val leafGroups = leaf.groupBy { case (_, b) => (b.lo, b.hi, b.cnt) }
        .values.toSeq
      val (constGroups, scanGroups) =
        leafGroups.partition(g => g.head._2.lo == g.head._2.hi)
      constGroups.foreach(_.foreach { case (k, b) => out(k) = b.lo })
      val refGroups = refine.groupBy { case (_, b) => (b.lo, b.hi, b.cnt) }
        .values.toSeq
      val allGroups = scanGroups ++ refGroups
      val next = mutable.ArrayBuffer[(Long, Bracket)]()
      if (allGroups.nonEmpty) {
        def keyOf(grp: Seq[(Long, Bracket)], i: Int): Column =
          if (i < scanGroups.length) v
          else binExpr(v, grp.head._2, bins).cast(DoubleType)
        val tag = allGroups.zipWithIndex
          .foldLeft(null: Column) { case (acc, (grp, i)) =>
            if (acc == null) when(grp.head._2.pred, i)
            else acc.when(grp.head._2.pred, i)
          }
        val key = allGroups.zipWithIndex
          .foldLeft(null: Column) { case (acc, (grp, i)) =>
            if (acc == null) when(grp.head._2.pred, keyOf(grp, i))
            else acc.when(grp.head._2.pred, keyOf(grp, i))
          }
        // STANDALONE range prefilter — an OR of plain ge/le ranges (one
        // bin-width slack per bracket, so it is a strict superset of the
        // exact CASE membership below): the tag CASE traps its embedded
        // range conjuncts where the parquet filter translator cannot see
        // them, so without this separate pure-comparison filter NOTHING
        // reaches PushedFilters and every narrowed re-scan reads the
        // whole table (caught by the real-plan audit in QuantilesSpec)
        def clampLo(x: Double) = if (x.isNegInfinity) -Double.MaxValue else x
        def clampHi(x: Double) = if (x.isPosInfinity) Double.MaxValue else x
        val range = allGroups.map { grp =>
          val b = grp.head._2
          val w = width(b.lo, b.hi, bins)
          v >= clampLo(b.lo - w) && v <= clampHi(b.hi + w)
        }.reduce(_ || _)
        // collected UNSORTED (driver-side sort of metadata-sized results
        // beats a whole range-partitioning exchange in the plan)
        val rows = base.filter(range)
          .select(tag.as("__t"), key.as("__k"))
          .filter(col("__t").isNotNull)
          .groupBy(col("__t"), col("__k")).agg(count(lit(1)).as("c"))
          .collect()
        val byTag = rows.groupBy(_.getInt(0))
          .map { case (t, rs) => t -> rs.sortBy(_.getDouble(1)) }
        // leaf tags: walk the sorted value counts to each rank
        for ((grp, i) <- scanGroups.zipWithIndex; (k, b) <- grp) {
          val vs = byTag(i)
          var acc = 0L; var j = 0; var found = false
          while (!found && j < vs.length) {
            acc += vs(j).getLong(2)
            if (b.offset < acc) { out(k) = vs(j).getDouble(1); found = true }
            j += 1
          }
          assert(found, s"rank ${b.offset} beyond bracket (cnt ${b.cnt})")
        }
        // refine tags: walk the histogram, narrow to the covering bin
        for ((grp, gi) <- refGroups.zipWithIndex) {
          val i = scanGroups.length + gi
          val b0 = grp.head._2
          val w = width(b0.lo, b0.hi, bins)
          val rows2 = byTag(i)
          val binIds = rows2.map(_.getDouble(1).toLong)
          val cs = rows2.map(_.getLong(2))
          for ((k, b) <- grp) {
            var acc = 0L; var j = 0
            while (j < binIds.length && acc + cs(j) <= b.offset) {
              acc += cs(j); j += 1
            }
            assert(j < binIds.length,
              s"rank ${b.offset} beyond histogram (cnt ${b.cnt})")
            val bn = binIds(j)
            val e0 = edge(b0.lo, b0.hi, bins, bn)
            val e1 = edge(b0.lo, b0.hi, bins, bn + 1)
            val lo2 = if (bn == 0) b.lo else e0
            val hi2 = if (bn == bins - 1) b.hi else e1
            // exact membership: the SAME bin expression; plus a one-bin-
            // slack plain range conjunct so parquet min/max row-group
            // stats prune the re-scan (slack absorbs edge rounding; an
            // endpoint underflowing to ±Inf merely weakens the hint)
            val pred2 = b.pred && binExpr(v, b0, bins) === bn.toInt &&
              v >= (e0 - w) && v <= (e1 + w)
            next += k -> Bracket(pred2, lo2, hi2, b.offset - acc, cs(j))
          }
        }
      }
      active = next.toSeq
    }
    out.toMap
  }

  /** Round a double as Spark's `round(col, 6)` does (shortest-string
    * BigDecimal, HALF_UP) — for embedding driver-computed cutoffs back
    * into a gate that previously rounded the in-plan percentile.
    */
  def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}
