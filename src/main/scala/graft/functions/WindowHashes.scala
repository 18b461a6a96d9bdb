package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Rolling 64-bit hashes of every `width`-token window of a token array:
  * `window_hashes(l, W)` returns `array<bigint>` of length
  * `max(0, size(l) − W + 1)`; element i hashes tokens `l[i .. i+W-1]`.
  *
  * Built for exact-substring dedup (the ExactSubstr move): the composed
  * form — `md5(concat_ws(' ', slice(l, p, W)))` per position — copies and
  * hashes O(T·W) characters per document and allocates a string per
  * window. This computes one FNV-1a hash per TOKEN and then rolls a
  * degree-(W−1) polynomial across positions, O(T) total work and zero
  * per-window allocation.
  *
  * The hash is internal plumbing, not an output: the dedup operator only
  * needs identical windows to collide and distinct windows to (almost
  * surely) differ — the polynomial over per-token hashes gives both, and
  * is even finer than the joined-string md5 (token boundaries are part of
  * the identity, so ["a b","c"] ≠ ["a","b c"]). A null token hashes to a
  * fixed sentinel, distinct from the empty string's hash.
  */
case class WindowHashes(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 1, s"window width must be >= 1, got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_hashes expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  @transient private lazy val scratch = new WindowHashes.Scratch(width)

  override def nullSafeEval(input: Any): Any =
    scratch.hashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("windowHashesScratch", scratch,
      classOf[WindowHashes.Scratch].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.hashes($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {

  /** Odd multiplier for the rolling polynomial (golden-ratio constant). */
  private val B = 0x9E3779B97F4A7C15L
  private val NullToken = 0x7F4A7C159E3779B9L

  /** FNV-1a 64 over the token's UTF-8 bytes, finalized with a murmur-style
    * mix so low-entropy tokens still spread across the 64-bit space.
    */
  private def tokenHash(t: org.apache.spark.unsafe.types.UTF8String): Long = {
    if (t == null) return NullToken
    val bytes = t.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  final class Scratch(width: Int) extends Serializable {
    // B^(width-1) for the roll-off term, computed once
    private val bPow: Long = {
      var p = 1L; var i = 1
      while (i < width) { p *= B; i += 1 }
      p
    }
    @transient private var th: Array[Long] = _

    def hashes(arr: ArrayData): ArrayData = {
      val n = arr.numElements()
      val m = n - width + 1
      if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
      if (th == null || th.length < n)
        th = new Array[Long](math.max(1024, Integer.highestOneBit(n) * 2))
      var i = 0
      while (i < n) { th(i) = tokenHash(arr.getUTF8String(i)); i += 1 }
      val out = new Array[Long](m)
      // H_0 = Σ th_j · B^(W-1-j); H_{i+1} = (H_i − th_i·B^(W-1))·B + th_{i+W}
      var h = 0L
      i = 0
      while (i < width) { h = h * B + th(i); i += 1 }
      out(0) = h
      i = 0
      while (i + 1 < m) {
        h = (h - th(i) * bPow) * B + th(i + width)
        out(i + 1) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
