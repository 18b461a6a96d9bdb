package org.apache.spark.sql

import org.apache.spark.sql.types.Decimal

/** Accessor for the `private[sql]` `Decimal.toPrecision` — the exact call
  * `Cast.changePrecision` makes, reused by graft.functions.FixedPointLong's
  * slow path so its overflow/rounding behavior is Spark's own (HALF_UP,
  * null-or-ANSI-error on overflow), not a reimplementation. Lives in the
  * org.apache.spark.sql package solely to satisfy the access modifier.
  */
object GraftDecimalBridge {
  def toPrecisionUnscaled(v: Double, precision: Int, scale: Int,
      nullOnOverflow: Boolean): java.lang.Long = {
    val d = Decimal(v).toPrecision(precision, scale, Decimal.ROUND_HALF_UP,
      nullOnOverflow)
    if (d == null) null else java.lang.Long.valueOf(d.toUnscaledLong)
  }
}
