package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document character-distribution statistics:
  * `char_entropy_stats(text)` returns
  * `struct(n BIGINT, n_distinct_ch INT, clogc DOUBLE)` — total code
  * points, distinct code points, and Σ c·ln(c) over the per-character
  * counts c — everything Shannon entropy needs, computed in ONE walk of
  * the string.
  *
  * Why an expression: the explode-per-character formulation fans a
  * corpus out to one row per code point (~10¹⁴ rows at 100 TB) and pays
  * two aggregations to reassemble per-doc counts the string itself
  * already holds. The histogram is charset-bounded, never corpus-bounded,
  * so it fits in a per-task scratch table and the whole operator becomes
  * a narrow map over the scan — zero shuffles, zero fan-out.
  *
  * clogc sums in first-appearance character order; consumers round the
  * derived entropy (1e-6) exactly as they did for the shuffle-order sums
  * of the explode formulation, so the ulp-level order difference is
  * absorbed. The scratch table uses generation stamps so per-row reset
  * is O(1), and grows by rehash if a document's alphabet outgrows it.
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats expects string, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_distinct_ch", IntegerType, nullable = false),
    StructField("clogc", DoubleType, nullable = false)))

  @transient private lazy val scratch = new CharEntropyStats.Scratch

  override def nullSafeEval(input: Any): Any =
    scratch.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropyScratch", scratch,
      classOf[CharEntropyStats.Scratch].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.stats($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

object CharEntropyStats {

  /** Per-task reusable code-point histogram (open addressing, generation
    * stamps for O(1) reset). Expressions are evaluated single-threaded
    * within a task and each task deserializes its own instance, so the
    * mutable scratch state is safe.
    */
  final class Scratch extends Serializable {
    // everything @transient: the scratch rebuilds empty on each task's
    // deserialization (transient field initializers do NOT re-run, so cap
    // must be set inside ensureInit, not at the declaration)
    @transient private var cap = 0
    @transient private var keys: Array[Int] = _
    @transient private var counts: Array[Long] = _
    @transient private var stamps: Array[Int] = _
    @transient private var gen = 0

    private def ensureInit(): Unit =
      if (keys == null) {
        cap = 1024
        keys = new Array[Int](cap)
        counts = new Array[Long](cap)
        stamps = new Array[Int](cap)
        gen = 0
      }

    def stats(s: UTF8String): InternalRow = {
      ensureInit()
      gen += 1
      val str = s.toString
      val len = str.length
      var n = 0L
      var distinct = 0
      var i = 0
      while (i < len) {
        val cp = str.codePointAt(i)
        var idx = (Integer.hashCode(cp * -1640531527) & Int.MaxValue) % cap
        while (stamps(idx) == gen && keys(idx) != cp) {
          idx += 1; if (idx == cap) idx = 0
        }
        if (stamps(idx) != gen) {
          // alphabet outgrowing half the table → rehash-free restart at 2x
          // (rare: caps at the document's distinct-code-point count)
          if (distinct * 2 >= cap) { grow(); return stats(s) }
          stamps(idx) = gen; keys(idx) = cp; counts(idx) = 0L
          distinct += 1
        }
        counts(idx) += 1L
        n += 1L
        i += Character.charCount(cp)
      }
      var clogc = 0d
      var j = 0
      while (j < cap) {
        if (stamps(j) == gen && counts(j) > 0L) {
          val c = counts(j).toDouble
          clogc += c * math.log(c)
        }
        j += 1
      }
      new GenericInternalRow(Array[Any](n, distinct, clogc))
    }

    private def grow(): Unit = {
      cap *= 2
      keys = new Array[Int](cap)
      counts = new Array[Long](cap)
      stamps = new Array[Int](cap)
      gen = 0
    }
  }
}
