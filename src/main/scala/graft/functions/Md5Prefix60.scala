package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of md5(str) as a BIGINT — the shingle-code mapping
  * `CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)` as ONE native
  * expression. The composed form materializes the 32-char hex string,
  * substrings it, and re-parses 15 hex digits per shingle instance; this
  * computes the same value straight off the digest bytes (first 7 bytes,
  * plus the high nibble of the 8th — exactly the 15-hex-digit prefix) and
  * participates in whole-stage codegen. Bit-identical to the composed form
  * and to the DuckDB oracle's `CAST(concat('0x', substr(md5(s), 1, 15)) AS
  * BIGINT)` — asserted in Md5Prefix60Spec over the corpus.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 expects string, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  // MessageDigest is stateful — one instance per executor thread, reset per
  // call, so the hot loop never allocates a digest object
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) >> 4) & 0xfL) // 15th hex digit = high nibble
  }
}
