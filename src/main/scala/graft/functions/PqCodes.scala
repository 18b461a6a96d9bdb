package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-subspace argmin quantizer over a COMPILE-TIME codebook: for
  * each subspace j of the input vector, the position p (0-based, in
  * codebook order) minimizing
  *
  *   l2  metric:  ‖c_jp‖² − 2 · (v_j · c_jp)   (argmin-L2; the dropped
  *                ‖v_j‖² is constant per (vector, subspace))
  *   dot metric:  −2 · (v_j · c_jp)            (argmax dot product)
  *
  * with strict-< selection in ascending p order — ties keep the LOWEST
  * position, matching both `row_number() OVER (ORDER BY key, p)` rank-1
  * and `min(struct(key, p))`. Dot products accumulate left-to-right like
  * VecDot and the oracle's chained `+`, and ‖c‖² is the same left-assoc
  * sum of squares, so keys are bit-identical to the r8–r15 formulations.
  *
  * Why an expression: the quantizer/codebook sides of the fixed ANN
  * operators are BOUNDED by construction (single-digit row counts), so
  * assignment/encode is a pure per-row map — but the higher-order-function
  * fold (`transform(sequence, j -> aggregate(sequence, ...))`) evaluates
  * interpreted per (row, subspace, codebook entry) and measured ~2× the
  * whole row cost at sf0.1, while the r8–r15 join shapes paid a full-
  * corpus Exchange (explode ×m + hash-agg argmin) to stay in codegen.
  * This is the SimhashVotes/VecDot move: native codegen'd loop, narrow
  * plan, no exchange. The codebook rides into the task as one flattened
  * primitive array reference (driver-collected once; bounded), never a
  * per-row literal.
  *
  * Null semantics: NULL input vector → NULL; a NULL element inside the
  * vector → NULL (vec_dot's poison rule). Subspace dots truncate to the
  * vector's actual length exactly like slice + vec_dot on a short array.
  */
case class PqCodes(vec: Expression, cb: Array[Array[Array[Double]]],
    useL2: Boolean) extends UnaryExpression {

  override def child: Expression = vec

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vec.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_codes expects array<double>, got $other")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val m: Int = cb.length
  private lazy val ksub: Int = cb.headOption.map(_.length).getOrElse(0)
  private lazy val sub: Int =
    cb.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  // codebook flattened to one primitive array [j][p][i] → j*ksub*sub +
  // p*sub + i, plus the per-(j,p) ‖c‖² keys (zero under the dot metric):
  // one object reference into the generated code, primitive math inside
  private lazy val cbFlat: Array[Double] = {
    val out = new Array[Double](m * ksub * sub)
    var j = 0
    while (j < m) {
      var p = 0
      while (p < ksub) {
        System.arraycopy(cb(j)(p), 0, out, (j * ksub + p) * sub, sub)
        p += 1
      }
      j += 1
    }
    out
  }
  private lazy val nc2Flat: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var p = 0
      while (p < ksub) {
        if (useL2) {
          var s = 0d
          var i = 0
          val row = cb(j)(p)
          while (i < sub) { s += row(i) * row(i); i += 1 }
          out(j * ksub + p) = s
        }
        p += 1
      }
      j += 1
    }
    out
  }

  private lazy val elemsNullable: Boolean = vec.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullable: Boolean = vec.nullable || elemsNullable

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val vlen = v.numElements()
    if (elemsNullable) {
      var i = 0
      while (i < vlen) { if (v.isNullAt(i)) return null; i += 1 }
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = -1
      var bestKey = Double.PositiveInfinity
      var p = 0
      while (p < ksub) {
        var dot = 0d
        var i = 0
        val off = (j * ksub + p) * sub
        val base = j * sub
        val n = math.min(sub, math.max(0, vlen - base))
        while (i < n) { dot += v.getDouble(base + i) * cbFlat(off + i); i += 1 }
        val key = nc2Flat(j * ksub + p) - 2d * dot
        if (key < bestKey) { best = p; bestKey = key }
        p += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cbFlat", cbFlat, "double[]")
    val nc2Ref = ctx.addReferenceObj("nc2Flat", nc2Flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val vlen = ctx.freshName("vlen")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val key = ctx.freshName("key")
      val best = ctx.freshName("best")
      val bestKey = ctx.freshName("bestKey")
      val nullGuard = if (elemsNullable)
        s"""for (int $i = 0; $i < $vlen; $i++) {
           |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
           |}
           |if (!${ev.isNull}) {""".stripMargin
      else "{"
      s"""
         |int $vlen = $v.numElements();
         |$nullGuard
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = -1;
         |  double $bestKey = Double.POSITIVE_INFINITY;
         |  int $base = $j * $sub;
         |  int $n = java.lang.Math.min($sub, java.lang.Math.max(0, $vlen - $base));
         |  for (int $p = 0; $p < $ksub; $p++) {
         |    double $dot = 0d;
         |    int $off = ($j * $ksub + $p) * $sub;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += $v.getDouble($base + $i) * $cbRef[$off + $i];
         |    }
         |    double $key = $nc2Ref[$j * $ksub + $p] - 2d * $dot;
         |    if ($key < $bestKey) { $best = $p; $bestKey = $key; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(vec = newChild)
}
