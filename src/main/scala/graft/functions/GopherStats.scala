package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Gopher-rule raw counts: `gopher_stats(text)` returns
  * `struct(n_words INT, n_alpha INT, n_sym INT, n_stop INT,
  * n_nosp INT, r_term INT)` with the exact semantics of the composed
  * regex battery:
  *
  * {{{
  *   n_words = size(regexp_extract_all(text, '[^ ]+'))
  *   n_alpha = size(regexp_extract_all(text, '[^ ]*[a-zA-Z][^ ]*'))
  *   n_sym   = size(regexp_extract_all(text, '[#{}<>|]'))
  *   n_stop  = size(regexp_extract_all(text, ' the | and | that | with '))
  *   n_nosp  = length(regexp_replace(text, ' ', ''))
  *   r_term  = CAST(text RLIKE '[.!?] *$' AS INT)
  * }}}
  *
  * Why an expression: seven regex scans per document on the corpus-gate
  * hot path (measured 2.1× the oracle at sf1). Semantics notes, each
  * asserted bit-for-bit against the composed form in NarrowStatsSpec:
  * - a word is a maximal run of non-space chars (the regexes split on
  *   the literal space only, not general whitespace);
  * - `[^ ]*[a-zA-Z][^ ]*` greedy-consumes the whole run, so n_alpha
  *   counts RUNS containing an ASCII letter, one match per run;
  * - the stopword alternation consumes its trailing space, so back-to-
  *   back stopwords (" the and ") yield ONE match — replicated by
  *   advancing past the consumed region;
  * - `length()` counts code points, so n_nosp subtracts low surrogates;
  * - `$` in RLIKE matches before one final line terminator, so r_term
  *   tolerates a single trailing \n, \r\n, \r, U+0085, U+2028 or
  *   U+2029 after the space run.
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects string, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_sym", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_nosp", IntegerType, nullable = false),
    StructField("r_term", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    GopherStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GopherStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.stats($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  @inline private def isSym(c: Char): Boolean =
    c == '#' || c == '{' || c == '}' || c == '<' || c == '>' || c == '|'

  // the four stopword bodies, in the alternation's order
  private val Stops = Array("the", "and", "that", "with")

  def stats(s: UTF8String): InternalRow = {
    val t = s.toString
    val len = t.length
    var nWords = 0; var nAlpha = 0; var nSym = 0
    var nNosp = 0; var lowSurr = 0
    var inRun = false; var runHasAlpha = false
    var i = 0
    while (i < len) {
      val c = t.charAt(i)
      if (c == ' ') {
        if (inRun) { inRun = false; if (runHasAlpha) nAlpha += 1 }
      } else {
        if (!inRun) { inRun = true; runHasAlpha = false; nWords += 1 }
        if (isAlpha(c)) runHasAlpha = true
        if (isSym(c)) nSym += 1
        nNosp += 1
        if (Character.isLowSurrogate(c)) lowSurr += 1
      }
      i += 1
    }
    if (inRun && runHasAlpha) nAlpha += 1
    nNosp -= lowSurr // length() counts code points, not UTF-16 units
    // stopword scan with match-region consumption
    var nStop = 0
    i = 0
    while (i < len) {
      if (t.charAt(i) == ' ') {
        var matched = 0
        var k = 0
        while (matched == 0 && k < Stops.length) {
          val w = Stops(k)
          val e = i + 1 + w.length
          if (e < len && t.charAt(e) == ' ' && t.regionMatches(i + 1, w, 0, w.length))
            matched = e + 1 - i
          k += 1
        }
        if (matched > 0) { nStop += 1; i += matched } else i += 1
      } else i += 1
    }
    // r_term: [.!?] *$ with $ tolerating one final line terminator
    var end = len
    if (end > 0) {
      val c = t.charAt(end - 1)
      if (c == '\n') {
        end -= 1
        if (end > 0 && t.charAt(end - 1) == '\r') end -= 1
      } else if (c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029') {
        end -= 1
      }
    }
    while (end > 0 && t.charAt(end - 1) == ' ') end -= 1
    val rTerm = if (end > 0 && {
      val c = t.charAt(end - 1); c == '.' || c == '!' || c == '?'
    }) 1 else 0
    new GenericInternalRow(Array[Any](nWords, nAlpha, nSym, nStop, nNosp, rTerm))
  }
}
