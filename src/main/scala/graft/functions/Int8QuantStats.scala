package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass symmetric int8 quantization statistics over an embedding:
  * `int8_quant_stats(vec)` returns
  * `struct(scale DOUBLE, code_sum BIGINT, n_sat INT, recon_err DOUBLE)` —
  * the max-abs scale (floored at 1e-12), the sum of the rounded codes,
  * the count of saturated (|code| = 127) elements, and the in-order sum
  * of squared reconstruction error.
  *
  * Why an expression: the composed form is FOUR higher-order-function
  * folds (`aggregate(v, ...)`) over the same array, and Catalyst
  * evaluates lambda bodies interpreted, per element — ~5M interpreted
  * expression evaluations per 20k×64-dim batch, measured at 3.8× the
  * DuckDB oracle at sf1. This walks the array twice (scale, then codes)
  * in plain JVM arithmetic inside whole-stage codegen.
  *
  * Bit-compatibility with the composed form (asserted over the fixture
  * corpus in NarrowStatsSpec): codes use Spark's own `round(x, 0)` double
  * semantics — HALF_UP on the shortest decimal string
  * (`java.math.BigDecimal.valueOf`), NOT `Math.round`'s floor(x+0.5),
  * which misrounds 0.49999999999999994 — then truncate-cast to long;
  * `recon_err` folds left-to-right in array order exactly as
  * `aggregate()` does, so the IEEE sum sequence is identical.
  */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_quant_stats expects array<float|double>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("code_sum", LongType, nullable = false),
    StructField("n_sat", IntegerType, nullable = false),
    StructField("recon_err", DoubleType, nullable = false)))

  // lazy: child.dataType is unavailable until the child resolves
  private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    Int8QuantStats.stats(input.asInstanceOf[ArrayData], fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Int8QuantStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$cls.stats($v, $fromFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

object Int8QuantStats {

  def stats(arr: ArrayData, fromFloat: Boolean): InternalRow = {
    val n = arr.numElements()
    // pass 1: max-abs scale (order-independent; a fold of greatest())
    var maxAbs = 0d
    var i = 0
    while (i < n) {
      val x = if (fromFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = math.max(maxAbs, 1e-12)
    // pass 2: codes + saturation + in-order reconstruction error
    var codeSum = 0L
    var nSat = 0
    var err = 0d
    i = 0
    while (i < n) {
      val x = if (fromFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val q = x * 127d / scale
      // Spark round(double, 0): HALF_UP on the shortest decimal string
      val c = java.math.BigDecimal.valueOf(q)
        .setScale(0, RoundingMode.HALF_UP).doubleValue().toLong
      codeSum += c
      if (math.abs(c) == 127L) nSat += 1
      val dv = x - c.toDouble * scale / 127d
      err += math.pow(dv, 2d)
      i += 1
    }
    new GenericInternalRow(Array[Any](scale, codeSum, nSat, err))
  }
}
