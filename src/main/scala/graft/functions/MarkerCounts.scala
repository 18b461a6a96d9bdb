package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass marker-word counts: `marker_counts(text, array('the', ...))`
  * returns `array<int>` where element i is
  * `size(regexp_extract_all(text, '\bmarker_i\b'))` — the language-ID
  * scoring primitive, all markers counted in ONE text walk instead of one
  * regex scan per marker (llm_langid ran 4 scans per document and
  * measured 3.4× the oracle at sf1; the same fusion shape as
  * [[GopherStats]]).
  *
  * Exact `\b` semantics, asserted bit-for-bit against the composed regex
  * form in NarrowStatsSpec: Java regex `\b` (ASCII `\w` = [A-Za-z0-9_]
  * without UNICODE_CHARACTER_CLASS) splits the text into maximal word
  * runs; a marker counts once per run that EQUALS it (a run merely
  * containing the marker — "them" vs "the" — has no boundary inside, so
  * the regex does not match there either). Markers are therefore required
  * to be non-empty `\w`-only literals at registration; anything else
  * would need the general regex engine and is rejected at analysis time.
  */
case class MarkerCounts(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  require(markers.nonEmpty &&
    markers.forall(m => m.nonEmpty && m.forall(MarkerCounts.isWordChar)),
    s"marker_counts markers must be non-empty \\w-only literals, got $markers")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"marker_counts expects string, got $t")
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "marker_counts"

  @transient private lazy val scratch = new MarkerCounts.Scratch(markers.toArray)

  override def nullSafeEval(input: Any): Any =
    scratch.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerCountsScratch", scratch,
      classOf[MarkerCounts.Scratch].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.counts($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)
}

object MarkerCounts {

  @inline private[functions] def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  final class Scratch(markers: Array[String]) extends Serializable {
    def counts(s: UTF8String): GenericArrayData = {
      val t = s.toString
      val len = t.length
      val out = new Array[Int](markers.length)
      var i = 0
      while (i < len) {
        if (isWordChar(t.charAt(i))) {
          var j = i + 1
          while (j < len && isWordChar(t.charAt(j))) j += 1
          val runLen = j - i
          var k = 0
          while (k < markers.length) {
            val m = markers(k)
            if (m.length == runLen && t.regionMatches(i, m, 0, runLen))
              out(k) += 1
            k += 1
          }
          i = j
        } else i += 1
      }
      new GenericArrayData(out)
    }
  }
}
