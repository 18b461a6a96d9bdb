package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Rolling 128-bit hashes of every `width`-token window of a token array:
  * `window_hashes(l, W)` returns `array<struct<h1:bigint, h2:bigint>>` of
  * length `max(0, size(l) − W + 1)`; element i hashes tokens
  * `l[i .. i+W-1]` under two INDEPENDENT rolling polynomials.
  *
  * Built for exact-substring dedup (the ExactSubstr move): the composed
  * form — `md5(concat_ws(' ', slice(l, p, W)))` per position — copies and
  * hashes O(T·W) characters per document and allocates a string per
  * window. This computes one FNV-1a hash per TOKEN and then rolls two
  * degree-(W−1) polynomials across positions, O(T) total work and zero
  * per-window allocation.
  *
  * Why a PAIR: the dedup operator keys duplicate windows on this value, so
  * a hash collision is a false-positive duplicate span. A single 64-bit
  * polynomial hits the birthday bound around 2^32 windows — real exposure
  * at the 100 TB corpus scale the operator targets (ADVICE r12). Two
  * independent 64-bit lanes (distinct odd multipliers over two decorrelated
  * per-token hash streams) put the bound back at ~2^64 windows. The pair
  * rides in one pass — the token-hash scan is shared and the second lane
  * adds only the second recurrence's multiply-adds.
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

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)
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

  /** Odd multipliers for the two rolling polynomials (golden-ratio
    * constant and a second independent odd constant from MurmurHash3's
    * finalizer family).
    */
  private val B1 = 0x9E3779B97F4A7C15L
  private val B2 = 0xC2B2AE3D27D4EB4FL
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

  /** Second per-token hash stream: a full avalanche remix of the first
    * (splitmix64 finalizer over th+const), so the two polynomial lanes see
    * decorrelated inputs — a pair collision needs BOTH difference
    * polynomials to vanish, not one polynomial under two bases.
    */
  private def remix(th: Long): Long = {
    var z = th + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  final class Scratch(width: Int) extends Serializable {
    // B^(width-1) for the roll-off terms, computed once per lane
    private val bPow1: Long = {
      var p = 1L; var i = 1
      while (i < width) { p *= B1; i += 1 }
      p
    }
    private val bPow2: Long = {
      var p = 1L; var i = 1
      while (i < width) { p *= B2; i += 1 }
      p
    }
    @transient private var th1: Array[Long] = _
    @transient private var th2: Array[Long] = _

    def hashes(arr: ArrayData): ArrayData = {
      val n = arr.numElements()
      val m = n - width + 1
      if (m <= 0) return new GenericArrayData(Array.empty[Any])
      if (th1 == null || th1.length < n) {
        // doubling growth, sized in Long space so n ≥ 2^30 cannot
        // overflow to a negative request (ADVICE r12) — clamp to n when
        // the doubled power of two would exceed Int range
        val want = math.max(1024L, Integer.highestOneBit(n).toLong * 2L)
        val cap = math.min(want, Int.MaxValue.toLong - 8L).toInt
        th1 = new Array[Long](math.max(cap, n))
        th2 = new Array[Long](math.max(cap, n))
      }
      var i = 0
      while (i < n) {
        val t = tokenHash(arr.getUTF8String(i))
        th1(i) = t
        th2(i) = remix(t)
        i += 1
      }
      val out = new Array[Any](m)
      // H_0 = Σ th_j · B^(W-1-j); H_{i+1} = (H_i − th_i·B^(W-1))·B + th_{i+W}
      var h1 = 0L
      var h2 = 0L
      i = 0
      while (i < width) { h1 = h1 * B1 + th1(i); h2 = h2 * B2 + th2(i); i += 1 }
      out(0) = new GenericInternalRow(Array[Any](h1, h2))
      i = 0
      while (i + 1 < m) {
        h1 = (h1 - th1(i) * bPow1) * B1 + th1(i + width)
        h2 = (h2 - th2(i) * bPow2) * B2 + th2(i + width)
        out(i + 1) = new GenericInternalRow(Array[Any](h1, h2))
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
