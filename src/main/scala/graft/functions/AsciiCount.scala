package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ascii_count(text, 'c')` — occurrences of one ASCII character, counted
  * directly over the UTF-8 BYTES of the value, zero-copy and zero-alloc.
  *
  * Why a custom expression for something `length(replace(...))` can spell:
  * every builtin formulation of "count a character" materializes a copy of
  * the document first — `replace` builds a full new UTF8String, `split`
  * allocates the token array, `regexp_count` runs the regex machinery.
  * Measured on the sf1 documents corpus (bench_notes_r15.md): the replace
  * form costs +0.21 s over the bare text-scan floor, the split form
  * +0.07 s; this byte loop is within noise of the floor. The count is
  * exact on any UTF-8 input: multi-byte sequences only use bytes
  * >= 0x80, so an ASCII target byte can never match inside one.
  *
  * The token-count identity it exists for: for a single-space delimiter,
  * `len(split(text, ' ')) == ascii_count(text, ' ') + 1` — split keeps
  * empty fields, so every space is a field boundary (llm_length_stats,
  * queries/Curation.scala).
  *
  * The target is restricted to ASCII at registration (GraftExtensions):
  * a multi-byte target would need real decoding, which is exactly the
  * cost this expression deletes.
  */
case class AsciiCount(child: Expression, target: Byte)
    extends UnaryExpression {

  require(target >= 0, s"ascii_count target must be ASCII (0-127), got $target")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ascii_count expects string, got $t")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ascii_count"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (s.getByte(i) == target) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cnt = ctx.freshName("cnt")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |int $cnt = 0;
         |int $n = $t.numBytes();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($t.getByte($i) == (byte) $target) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): AsciiCount =
    copy(child = newChild)
}

/** `token_runs(text)` — the number of maximal runs of non-space bytes,
  * i.e. exactly `size(regexp_extract_all(text, '[^ ]+', 0))`, counted
  * zero-copy over the UTF-8 bytes ([[AsciiCount]]'s rule: 0x20 never
  * occurs inside a multi-byte sequence, so byte-level spaces ARE
  * code-point spaces).
  *
  * Why: the whitespace token count appears on eight query hot paths
  * (quality weighting, corpus tallies, source mix, LM metadata, sampling
  * weights), each paying a full regexp pass that materializes every
  * token as a fresh UTF8String only to take the array's length. This is
  * one branchy byte loop, no allocation. NULL text → NULL, matching
  * `size(regexp_extract_all(NULL, ...))` under the engine's non-legacy
  * size(NULL) semantics.
  */
case class TokenRuns(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_runs expects string, got $t")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_runs"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var cnt = 0
    var prevSpace = true
    var i = 0
    while (i < n) {
      val isSpace = s.getByte(i) == 0x20.toByte
      if (!isSpace && prevSpace) cnt += 1
      prevSpace = isSpace
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cnt = ctx.freshName("cnt")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val prevSpace = ctx.freshName("prevSpace")
    val isSpace = ctx.freshName("isSpace")
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |int $cnt = 0;
         |int $n = $t.numBytes();
         |boolean $prevSpace = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $isSpace = $t.getByte($i) == (byte) 0x20;
         |  if (!$isSpace && $prevSpace) $cnt++;
         |  $prevSpace = $isSpace;
         |}
         |${ev.value} = $cnt;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenRuns =
    copy(child = newChild)
}
