package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distinct 60-bit shingle codes of a token array, in ONE narrow pass:
  * `shingle_codes(l)` returns `array<bigint>` holding, for every 3-token
  * window of `l`, `md5_prefix60(concat_ws(' ', t_i, t_{i+1}, t_{i+2}))`
  * (see [[Md5Prefix60]]), deduplicated in first-appearance order.
  *
  * Replaces [explode one row per shingle instance → groupBy(doc_id)
  * collect_set] in the shingle-profile build: the per-doc distinct set is
  * document-bounded, never corpus-bounded, so it fits in per-task scratch
  * (generation-stamped open addressing, the [[BigramRepStats]] pattern)
  * and the profile becomes a map over the scan — the corpus-sized
  * aggregation exchange and its object-hash collect_set state disappear.
  * At 100 TB that exchange moves ~10^13 shingle-instance rows; this moves
  * none.
  *
  * Bit-identical to the composed form (and to the DuckDB oracle's
  * `DISTINCT CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)`): the
  * shingle bytes fed to MD5 are exactly concat_ws's output — tokens
  * joined by single ' ', null elements skipped — asserted over the corpus
  * in NarrowStatsSpec.
  */
case class ShingleCodes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_codes expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val scratch = new ShingleCodes.Scratch

  override def nullSafeEval(input: Any): Any =
    scratch.codes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleCodesScratch", scratch,
      classOf[ShingleCodes.Scratch].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.codes($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleCodes =
    copy(child = newChild)
}

object ShingleCodes {

  private val Space = Array[Byte](' ')

  /** Per-task reusable scratch: one MD5 digest and a long-keyed seen-set
    * with generation stamps (O(1) reset), plus the growable output buffer.
    * Single-threaded per task, like every expression's eval.
    */
  final class Scratch extends Serializable {
    @transient private var md: java.security.MessageDigest = _
    @transient private var cap = 0
    @transient private var keys: Array[Long] = _
    @transient private var stamps: Array[Int] = _
    @transient private var gen = 0
    @transient private var out: Array[Long] = _

    private def ensureInit(): Unit =
      if (keys == null) {
        md = java.security.MessageDigest.getInstance("MD5")
        cap = 2048
        keys = new Array[Long](cap)
        stamps = new Array[Int](cap)
        out = new Array[Long](1024)
        gen = 0
      }

    def codes(arr: ArrayData): ArrayData = {
      ensureInit()
      gen += 1
      val n = arr.numElements()
      var outN = 0
      var i = 0
      while (i + 2 < n) {
        // concat_ws(' ', a, b, c): null tokens skipped, survivors joined
        // by one space — byte-for-byte the composed form's md5 input
        md.reset()
        var appended = 0
        var j = i
        while (j < i + 3) {
          val t = arr.getUTF8String(j)
          if (t != null) {
            if (appended > 0) md.update(Space)
            md.update(t.getBytes)
            appended += 1
          }
          j += 1
        }
        val digest = md.digest()
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
        v = (v << 4) | ((digest(7) >> 4) & 0xfL)

        // first-appearance dedup via the stamped open-addressing set
        var idx = (java.lang.Long.hashCode(v * -7046029254386353131L)
          & Int.MaxValue) % cap
        while (stamps(idx) == gen && keys(idx) != v) {
          idx += 1; if (idx == cap) idx = 0
        }
        if (stamps(idx) != gen) {
          if ((outN + 1) * 2 >= cap) { grow(); return codes(arr) }
          stamps(idx) = gen; keys(idx) = v
          if (outN == out.length) out = java.util.Arrays.copyOf(out, outN * 2)
          out(outN) = v
          outN += 1
        }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, outN))
    }

    private def grow(): Unit = {
      cap *= 2
      keys = new Array[Long](cap)
      stamps = new Array[Int](cap)
      gen = 0
    }
  }
}
