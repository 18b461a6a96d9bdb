package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass char-bigram language-model scorer.
  *
  * `bigram_lm_stats(text, keys, lps)` walks the document's code points once
  * and returns `struct(n_bigrams BIGINT, lp_sum DOUBLE)` — the count of
  * bigrams found in the model and the sum of their log-probabilities.
  * `keys`/`lps` must be FOLDABLE parallel array literals: `keys(i)` is a
  * bigram packed as `cp1 * 0x110000 + cp2` (code points, so the packing is
  * injective over all of Unicode) and `lps(i)` its log-probability.
  *
  * Why an expression and not explode+join: the model is vocabulary-sized
  * (≤ |charset|² entries — bounded by the character set, NOT by corpus
  * size), so it travels as a plan literal, and scoring collapses from
  * [corpus-sized explode → repartition → broadcast join → groupBy shuffle]
  * to a narrow map over the scan. Left-to-right summation matches the
  * fold order any per-doc sequential sum uses; callers round at 1e-6 so
  * shuffle-order noise vs the oracle's aggregation order is absorbed.
  *
  * The probe table is open-addressing long→double (power-of-two capacity,
  * multiplicative hashing) built lazily once per task from the literal
  * arrays (micro-seconds at vocabulary size) — no boxing on the per-bigram
  * hot path.
  */
case class BigramLmStats(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "bigram_lm_stats model arrays must be foldable literals")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"bigram_lm_stats expects (string, array<bigint>, array<double>), got ($a, $b, $c)")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("lp_sum", DoubleType, nullable = false)))

  override def nullable: Boolean = first.nullable

  @transient private lazy val table: BigramLm.Table = {
    val ks = second.eval(null).asInstanceOf[ArrayData].toLongArray()
    val vs = third.eval(null).asInstanceOf[ArrayData].toDoubleArray()
    BigramLm.Table.build(ks, vs)
  }

  override def eval(input: InternalRow): Any = {
    val t = first.eval(input)
    if (t == null) null else table.stats(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramLmTable", table,
      classOf[BigramLm.Table].getName)
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.stats($t);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BigramLmStats =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BigramLm {

  /** Pack a 2-code-point bigram string the way the scorer keys its table. */
  def packKey(g: String): Long = {
    val cp1 = g.codePointAt(0)
    val cp2 = g.codePointAt(Character.charCount(cp1))
    cp1.toLong * 0x110000L + cp2.toLong
  }

  /** Serializable open-addressing long→double map (linear probing). Keys
    * are non-negative (packed code points), so -1 marks an empty slot.
    */
  final class Table private (keys: Array[Long], vals: Array[Double],
      mask: Int) extends Serializable {

    def stats(s: UTF8String): InternalRow = {
      val str = s.toString
      val len = str.length
      var n = 0L
      var sum = 0d
      var i = 0
      var prev = -1
      while (i < len) {
        val cp = str.codePointAt(i)
        if (prev >= 0) {
          val k = prev.toLong * 0x110000L + cp.toLong
          // multiplicative spread, then linear probe
          var idx = (java.lang.Long.hashCode(k * -7046029254386353131L)) & mask
          var kk = keys(idx)
          while (kk != -1L && kk != k) {
            idx = (idx + 1) & mask; kk = keys(idx)
          }
          if (kk == k) { n += 1L; sum += vals(idx) }
        }
        prev = cp
        i += Character.charCount(cp)
      }
      new GenericInternalRow(Array[Any](n, sum))
    }
  }

  object Table {
    def build(ks: Array[Long], vs: Array[Double]): Table = {
      require(ks.length == vs.length)
      var cap = 8
      while (cap < ks.length * 2) cap <<= 1
      val keys = Array.fill(cap)(-1L)
      val vals = new Array[Double](cap)
      val mask = cap - 1
      var i = 0
      while (i < ks.length) {
        val k = ks(i)
        var idx = (java.lang.Long.hashCode(k * -7046029254386353131L)) & mask
        while (keys(idx) != -1L && keys(idx) != k) idx = (idx + 1) & mask
        keys(idx) = k; vals(idx) = vs(i)
        i += 1
      }
      new Table(keys, vals, mask)
    }
  }
}
