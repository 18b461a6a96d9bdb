package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document char-bigram HISTOGRAM in one narrow pass:
  * `bigram_counts(text)` returns `array<struct<g BIGINT, n BIGINT>>` —
  * every consecutive code-point bigram of the document packed as
  * `cp1 * 0x110000 + cp2` (the [[BigramLm.packKey]] injective packing the
  * scorer keys its table with), with its occurrence count, in
  * first-appearance order.
  *
  * Why an expression: the LM TRAINING fan-out (llm_lm_score /
  * llm_ppl_buckets / llm_dsir_weights) previously materialized the corpus
  * as one row per bigram INSTANCE — `split(text, "(?!^)")` (one String
  * per code point), `explode(sequence(...))` (one row per position) and a
  * 2-char `concat` per position — ~3 allocations per corpus character
  * before the aggregation's map side ever saw a row. The histogram is
  * document-bounded (min(len−1, alphabet²) entries), so it fits per-task
  * scratch (the [[ShingleCodes]] generation-stamped open-addressing
  * pattern), and the fan-out becomes explode(histogram) — rows and bytes
  * into the partial aggregation shrink from per-instance to per-distinct-
  * per-doc, with zero string churn. Aggregating the per-doc counts
  * (sum(n)) is exactly the instance count(*): same model, bit-identical
  * log-probs downstream.
  *
  * Documents with fewer than two code points yield an empty array (no
  * bigrams — the callers' `length(text) >= 2` filter keeps the input
  * domain identical to the exploded form on any corpus the old shape
  * accepted).
  */
case class BigramCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bigram_counts expects string, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("g", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  @transient private lazy val scratch = new BigramCounts.Scratch

  override def nullSafeEval(input: Any): Any =
    scratch.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramCountsScratch", scratch,
      classOf[BigramCounts.Scratch].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.counts($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramCounts =
    copy(child = newChild)
}

object BigramCounts {

  /** Per-task reusable scratch: long-keyed open-addressing count map with
    * generation stamps (O(1) reset across rows) and a growable
    * insertion-order key buffer. Single-threaded per task, like every
    * expression's eval ([[ShingleCodes.Scratch]] precedent).
    */
  final class Scratch extends Serializable {
    @transient private var cap = 0
    @transient private var keys: Array[Long] = _
    @transient private var cnts: Array[Long] = _
    @transient private var stamps: Array[Int] = _
    @transient private var gen = 0
    @transient private var order: Array[Int] = _

    private def ensureInit(): Unit =
      if (keys == null) {
        cap = 2048
        keys = new Array[Long](cap)
        cnts = new Array[Long](cap)
        stamps = new Array[Int](cap)
        order = new Array[Int](1024)
        gen = 0
      }

    private def grow(liveSlots: Int): Unit = {
      // rehash live slots into a doubled table, preserving order[]'s
      // slot indices by rebuilding them in insertion order
      val oldKeys = keys; val oldCnts = cnts
      val oldOrder = order
      cap <<= 1
      keys = new Array[Long](cap)
      cnts = new Array[Long](cap)
      stamps = new Array[Int](cap)
      gen = 1
      var i = 0
      while (i < liveSlots) {
        val k = oldKeys(oldOrder(i))
        val c = oldCnts(oldOrder(i))
        var idx = (java.lang.Long.hashCode(k * -7046029254386353131L)) & (cap - 1)
        while (stamps(idx) == gen) idx = (idx + 1) & (cap - 1)
        keys(idx) = k; cnts(idx) = c; stamps(idx) = gen
        order(i) = idx
        i += 1
      }
    }

    def counts(s: UTF8String): ArrayData = {
      ensureInit()
      gen += 1
      val str = s.toString
      val len = str.length
      var nDistinct = 0
      var i = 0
      var prev = -1
      while (i < len) {
        val cp = str.codePointAt(i)
        if (prev >= 0) {
          val k = prev.toLong * 0x110000L + cp.toLong
          var idx = (java.lang.Long.hashCode(k * -7046029254386353131L)) & (cap - 1)
          while (stamps(idx) == gen && keys(idx) != k) idx = (idx + 1) & (cap - 1)
          if (stamps(idx) == gen) cnts(idx) += 1L
          else {
            keys(idx) = k; cnts(idx) = 1L; stamps(idx) = gen
            if (nDistinct == order.length)
              order = java.util.Arrays.copyOf(order, order.length << 1)
            order(nDistinct) = idx
            nDistinct += 1
            // keep load factor under 1/2; grow resets gen to 1
            if (nDistinct * 2 > cap) { grow(nDistinct); gen = 1 }
          }
        }
        prev = cp
        i += Character.charCount(cp)
      }
      val out = new Array[Any](nDistinct)
      var j = 0
      while (j < nDistinct) {
        out(j) = new GenericInternalRow(
          Array[Any](keys(order(j)), cnts(order(j))))
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Polynomial rolling hash over the token SEQUENCE of a document —
  * `token_roll_hash(text)` ≡
  *
  *   CAST(aggregate(filter(split(text, ' '), t -> t != ''), '0',
  *     (acc, t) -> CAST((CAST(acc AS BIGINT) * 131 + byte0(md5(t)))
  *                      % 1000000007 AS STRING)) AS BIGINT)
  *
  * where byte0 is the first digest byte, i.e. the oracle's
  * `(strpos(hex, substr(md5(t),1,1))-1)*16 + strpos(hex, substr(md5(t),2,1))-1`.
  *
  * Why an expression: the composed fold runs INTERPRETED per token with a
  * string-typed accumulator — per token it allocates the split token, the
  * 32-char md5 hex string, two substrings, and round-trips the
  * accumulator long through CAST(STRING)/CAST(BIGINT) (llm_fingerprint
  * measured 4.0 s at sf1, ~1.7× the DuckDB twin of the same fold). This
  * walks the raw UTF-8 bytes once, splitting on the 0x20 byte (safe:
  * space never occurs inside a multi-byte UTF-8 sequence), MD5s each
  * non-empty token's bytes directly and keeps the accumulator a long.
  * Intermediate values stay exact: acc < 2^30, so acc·131 + 255 < 2^38 —
  * no overflow, matching the string-fold's arbitrary-precision-free
  * arithmetic. Empty token list (empty/whitespace-only text) returns the
  * seed 0, exactly like the fold's unconsumed '0'. NULL text → NULL.
  */
case class TokenRollHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_roll_hash expects string, got $t")
  }

  override def dataType: DataType = LongType

  @transient private lazy val scratch = new TokenRollHash.Scratch

  override def nullSafeEval(input: Any): Any =
    scratch.roll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenRollHashScratch", scratch,
      classOf[TokenRollHash.Scratch].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.roll($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenRollHash =
    copy(child = newChild)
}

object TokenRollHash {

  private val P = 1000000007L

  final class Scratch extends Serializable {
    @transient private var md: java.security.MessageDigest = _

    def roll(s: UTF8String): Long = {
      if (md == null) md = java.security.MessageDigest.getInstance("MD5")
      val bytes = s.getBytes
      var acc = 0L
      var start = 0
      var i = 0
      val n = bytes.length
      while (i <= n) {
        if (i == n || bytes(i) == ' '.toByte) {
          if (i > start) { // non-empty token [start, i)
            md.reset()
            md.update(bytes, start, i - start)
            val b0 = md.digest()(0) & 0xff
            acc = (acc * 131L + b0) % P
          }
          start = i + 1
        }
        i += 1
      }
      acc
    }
  }
}
