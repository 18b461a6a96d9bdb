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
    val v = col(value)
    val byKeys = Window.partitionBy(keys.map(col): _*)
    val cum = df.filter(v.isNotNull)
      .groupBy((keys.map(col) :+ v): _*).agg(count(lit(1)).as("__cnt"))
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
    }
    val sel = keys.map(col) ++ ps.indices.map { i =>
      val r = col(s"__r_$i"); val kl = floor(r); val kh = ceil(r)
      when(kl === kh, col(s"__vl_$i").cast(DoubleType))
        .otherwise(
          (kh.cast(DoubleType) - r) * col(s"__vl_$i") +
            (r - kl.cast(DoubleType)) * col(s"__vh_$i"))
        .as(names(i))
    }
    cum.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      .select(sel: _*)
  }

  /** Exact interpolated global quantiles of `value` at probabilities `ps`,
    * driver-coordinated histogram-bracket selection (doc above). The
    * returned doubles are bit-identical to `percentile(value, p)`.
    */
  def percentiles(df: DataFrame, value: String, ps: Seq[Double],
      bins: Int = 4096, leafLimit: Long = 1L << 16): Seq[Double] = {
    require(ps.forall(p => p >= 0 && p <= 1), "p in [0,1]")
    val base = df.select(col(value).cast(DoubleType).as("__v"))
      .filter(col("__v").isNotNull)
    val st = base.agg(count(lit(1)), min(col("__v")), max(col("__v"))).head()
    val n = st.getLong(0)
    require(n > 0, "percentile of empty input")
    val mn = st.getDouble(1); val mx = st.getDouble(2)
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
      // value is identical, or when its range is within `bins` ulps (the
      // histogram can no longer split it, but then it holds ≤ bins+1
      // distinct doubles, so the distinct-leaf stays bounded); the pass
      // cap is a pure backstop — range shrinks bins× per pass, so 40
      // passes out-divide the entire double dynamic range
      val (leaf, refine) = active.partition { case (_, b) =>
        b.cnt <= leafLimit || b.lo == b.hi || pass > 40 ||
          (b.hi - b.lo) <=
            math.ulp(math.max(math.abs(b.lo), math.abs(b.hi))) * bins
      }
      // brackets for nearby ranks coincide (p01's floor/ceil ranks, both
      // tails on the first pass) — dedup them; DISTINCT brackets are
      // pairwise disjoint by construction (identical parents dedup, and
      // children of one parent are different bins), so every bracket at
      // this pass shares ONE tagged scan: at 100 TB a pass costs one
      // column read however many quantiles are in flight.
      val leafGroups = leaf.groupBy { case (_, b) => (b.lo, b.hi, b.cnt) }
        .values.toSeq
      val (constGroups, scanGroups) =
        leafGroups.partition(g => g.head._2.lo == g.head._2.hi)
      constGroups.foreach(_.foreach { case (k, b) => out(k) = b.lo })
      if (scanGroups.nonEmpty) {
        val tag = scanGroups.zipWithIndex
          .foldLeft(null: Column) { case (acc, (grp, i)) =>
            if (acc == null) when(grp.head._2.pred, i)
            else acc.when(grp.head._2.pred, i)
          }
        // collected UNSORTED (driver-side sort of ≤ leafLimit metadata
        // rows beats a whole range-partitioning exchange in the plan)
        val rows = base.select(tag.as("__t"), v)
          .filter(col("__t").isNotNull)
          .groupBy(col("__t"), v).agg(count(lit(1)).as("c"))
          .collect()
        val byTag = rows.groupBy(_.getInt(0))
          .map { case (t, rs) => t -> rs.sortBy(_.getDouble(1)) }
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
      }
      val next = mutable.ArrayBuffer[(Long, Bracket)]()
      val refGroups = refine.groupBy { case (_, b) => (b.lo, b.hi, b.cnt) }
        .values.toSeq
      if (refGroups.nonEmpty) {
        def binExpr(b: Bracket): Column = {
          val w = (b.hi - b.lo) / bins
          least(greatest(floor((v - b.lo) / w), lit(0L)),
            lit((bins - 1).toLong)).cast(IntegerType)
        }
        val tag = refGroups.zipWithIndex
          .foldLeft(null: Column) { case (acc, (grp, i)) =>
            if (acc == null) when(grp.head._2.pred, i)
            else acc.when(grp.head._2.pred, i)
          }
        val bin = refGroups.zipWithIndex
          .foldLeft(null: Column) { case (acc, (grp, i)) =>
            if (acc == null) when(grp.head._2.pred, binExpr(grp.head._2))
            else acc.when(grp.head._2.pred, binExpr(grp.head._2))
          }
        // unsorted collect + driver-side sort, as above
        val hist = base.select(tag.as("__t"), bin.as("__b"))
          .filter(col("__t").isNotNull)
          .groupBy(col("__t"), col("__b")).agg(count(lit(1)).as("c"))
          .collect()
        val byTag = hist.groupBy(_.getInt(0))
          .map { case (t, rs) => t -> rs.sortBy(_.getInt(1)) }
        for ((grp, i) <- refGroups.zipWithIndex) {
          val b0 = grp.head._2
          val w = (b0.hi - b0.lo) / bins
          val rows = byTag(i)
          val binIds = rows.map(_.getInt(1)); val cs = rows.map(_.getLong(2))
          for ((k, b) <- grp) {
            var acc = 0L; var j = 0
            while (j < binIds.length && acc + cs(j) <= b.offset) {
              acc += cs(j); j += 1
            }
            assert(j < binIds.length,
              s"rank ${b.offset} beyond histogram (cnt ${b.cnt})")
            val bn = binIds(j)
            val lo2 = if (bn == 0) b.lo else b.lo + w * bn
            val hi2 = if (bn == bins - 1) b.hi else b.lo + w * (bn + 1)
            // exact membership: the SAME bin expression; plus a one-bin-
            // slack plain range conjunct so parquet min/max row-group
            // stats prune the re-scan
            val pred2 = b.pred && binExpr(b0) === bn &&
              v >= (b.lo + w * (bn - 1)) && v <= (b.lo + w * (bn + 2))
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
