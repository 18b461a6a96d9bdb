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
  * form in NarrowStatsSpec (including non-ASCII cases): Java regex `\b`
  * is Unicode-aware even WITHOUT `UNICODE_CHARACTER_CLASS` — its
  * `Pattern.Bound` word test is `ch == '_' || Character.isLetterOrDigit(ch)`
  * over code points, NOT ASCII `\w` (so `\bthe\b` does not match inside
  * "éthe" or "漢the": the é/漢 extend the word run). That test splits the
  * text into maximal word runs; a marker counts once per run that EQUALS
  * it (a run merely containing the marker — "them" vs "the" — has no
  * boundary inside, so the regex does not match there either). Markers
  * themselves are required to be non-empty ASCII `\w`-only literals at
  * registration; anything else would need the general regex engine and is
  * rejected at analysis time.
  */
case class MarkerCounts(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  require(markers.nonEmpty &&
    markers.forall(m => m.nonEmpty && m.forall(MarkerCounts.isAsciiWordChar)),
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

  @inline private[functions] def isAsciiWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Java `Pattern.Bound`'s word test in default (non-UNICODE_CHARACTER_CLASS)
    * mode — over full code points, so supplementary-plane letters extend
    * word runs exactly as the regex engine sees them.
    */
  @inline private[functions] def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  final class Scratch(markers: Array[String]) extends Serializable {
    def counts(s: UTF8String): GenericArrayData = {
      val t = s.toString
      val len = t.length
      val out = new Array[Int](markers.length)
      var i = 0
      while (i < len) {
        val cp = t.codePointAt(i)
        if (isWordCp(cp)) {
          var j = i + Character.charCount(cp)
          var inRun = true
          while (inRun && j < len) {
            val cj = t.codePointAt(j)
            if (isWordCp(cj)) j += Character.charCount(cj) else inRun = false
          }
          val runLen = j - i
          var k = 0
          while (k < markers.length) {
            val m = markers(k)
            if (m.length == runLen && t.regionMatches(i, m, 0, runLen))
              out(k) += 1
            k += 1
          }
          i = j
        } else i += Character.charCount(cp)
      }
      new GenericArrayData(out)
    }
  }
}
