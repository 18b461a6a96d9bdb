package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The full k-seed affine minhash signature in ONE pass over the code
  * array: `minhash_sig(codes, a, c, p)` returns, for each seed j,
  * `min over x in codes of (a[j] * (x >> 32) + c[j]) % p` — the same
  * value as k independent `array_min(transform(...))` traversals
  * (`x >> 32` = the md5-prefix60's top 28 bits = the oracle's
  * `conv(substr(md5, 1, 7), 16, 10)` per-seed input; a·x28 < 2^59, no
  * overflow for the seed family in use).
  *
  * Exists because the per-seed formulation runs k INTERPRETED lambda
  * traversals per document (higher-order functions don't participate in
  * whole-stage codegen) — the regression the r6 profile measured at
  * 1.35 s of the minhash pipeline's 2.5 s. This is one codegen'd call
  * that touches each code exactly once and updates k running minima.
  *
  * `a` and `c` must be foldable array literals (the seed family is a
  * compile-time constant of the pipeline); they are evaluated once per
  * expression instance, not per row.
  */
case class MinhashSig(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _),
            ArrayType(LongType, _), LongType) =>
        if (second.foldable && third.foldable && fourth.foldable)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "minhash_sig seeds (a, c) and modulus p must be foldable")
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects (array<bigint>, array<bigint>, array<bigint>, bigint), got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // the codes operand stays nullable-propagating; seeds are literals
  override def nullable: Boolean = first.nullable

  @transient private lazy val aSeeds: Array[Long] =
    second.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val cSeeds: Array[Long] =
    third.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val pMod: Long =
    fourth.eval(null).asInstanceOf[Long]

  def sig(codes: ArrayData): ArrayData = {
    val k = aSeeds.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = codes.numElements()
    var i = 0
    while (i < n) {
      val x28 = codes.getLong(i) >> 32
      var j = 0
      while (j < k) {
        val v = (aSeeds(j) * x28 + cSeeds(j)) % pMod
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def nullSafeEval(codes: Any, a: Any, c: Any,
      p: Any): Any = sig(codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this,
      classOf[MinhashSig].getName)
    nullSafeCodeGen(ctx, ev, (codes, _, _, _) =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.sig($codes);""".stripMargin)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): MinhashSig =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}
