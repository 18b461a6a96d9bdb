package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003) of a token
  * array in ONE narrow pass: `winnow_prints(l)` returns `array<bigint>`
  * holding, for every 5-window of consecutive 4-gram hashes, the window
  * MINIMUM — deduplicated in first-appearance order. The per-position
  * hash is the first 28 bits of md5 of the space-joined 4-gram,
  * bit-identical to the composed form
  * `CAST(conv(substr(md5(concat_ws(' ', slice(l, i, 4))), 1, 7), 16, 10)
  * AS BIGINT)` and to the DuckDB oracle's
  * `CAST(concat('0x', substr(md5(g), 1, 7)) AS BIGINT)`.
  *
  * Replaces a transform(md5)+transform(array_min(slice))+array_distinct
  * higher-order chain: one MessageDigest reused across grams, no
  * intermediate string allocation for hex parsing, the [[ShingleCodes]]
  * stamped-set dedup — the per-document cost IS the hash count, which is
  * the whole fingerprinting budget at 100 TB.
  */
case class WinnowPrints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_prints expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val scratch = new WinnowPrints.Scratch

  override def nullSafeEval(input: Any): Any =
    scratch.prints(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowPrintsScratch", scratch,
      classOf[WinnowPrints.Scratch].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.prints($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowPrints =
    copy(child = newChild)
}

object WinnowPrints {

  val K = 4 // gram length
  val W = 5 // winnowing window (hash positions per window)

  private val Space = Array[Byte](' ')

  /** Per-task reusable scratch (the [[ShingleCodes]] pattern): one MD5
    * digest, a growable per-position hash buffer, and a stamped
    * open-addressing seen-set for first-appearance dedup.
    */
  final class Scratch extends Serializable {
    @transient private var md: java.security.MessageDigest = _
    @transient private var hs: Array[Long] = _
    @transient private var cap = 0
    @transient private var keys: Array[Long] = _
    @transient private var stamps: Array[Int] = _
    @transient private var gen = 0
    @transient private var out: Array[Long] = _

    private def ensureInit(): Unit =
      if (keys == null) {
        md = java.security.MessageDigest.getInstance("MD5")
        hs = new Array[Long](1024)
        cap = 2048
        keys = new Array[Long](cap)
        stamps = new Array[Int](cap)
        out = new Array[Long](1024)
        gen = 0
      }

    def prints(arr: ArrayData): ArrayData = {
      ensureInit()
      gen += 1
      val n = arr.numElements()
      val nh = n - (K - 1) // 4-gram positions
      if (nh < W) return new GenericArrayData(Array.emptyLongArray)
      if (hs.length < nh) hs = new Array[Long](Integer.highestOneBit(nh) * 2)
      var i = 0
      while (i < nh) {
        // concat_ws(' ', g0..g3): null tokens skipped, survivors joined
        // by one space — byte-for-byte the composed form's md5 input
        md.reset()
        var appended = 0
        var j = i
        while (j < i + K) {
          val t = arr.getUTF8String(j)
          if (t != null) {
            if (appended > 0) md.update(Space)
            md.update(t.getBytes)
            appended += 1
          }
          j += 1
        }
        val d = md.digest()
        // first 7 hex chars of the digest = 28 bits: 3 bytes + high nibble
        hs(i) = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
          ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >> 4)
        i += 1
      }
      var outN = 0
      var w = 0
      while (w <= nh - W) {
        var mn = hs(w)
        var k = w + 1
        while (k < w + W) { if (hs(k) < mn) mn = hs(k); k += 1 }
        // first-appearance dedup via the stamped open-addressing set
        var idx = (java.lang.Long.hashCode(mn * -7046029254386353131L)
          & Int.MaxValue) % cap
        while (stamps(idx) == gen && keys(idx) != mn) {
          idx += 1; if (idx == cap) idx = 0
        }
        if (stamps(idx) != gen) {
          if ((outN + 1) * 2 >= cap) { grow(); return prints(arr) }
          stamps(idx) = gen; keys(idx) = mn
          if (outN == out.length) out = java.util.Arrays.copyOf(out, outN * 2)
          out(outN) = mn
          outN += 1
        }
        w += 1
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
