package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Per-group top-k WITHOUT a per-group sort: `topk_structs(s, k, descs)`
  * keeps the k lexicographically-smallest struct rows of `s` per group —
  * each field compared with its own direction from the foldable boolean
  * array `descs` (true = that field ranks descending) — and returns them
  * as a sorted `array<struct>`.
  *
  * This is the aggregation shape `row_number() OVER (PARTITION BY g ORDER
  * BY ...) <= k` should compile to when |groups| is small: the window
  * formulation shuffles EVERY fact row to its group's partition and sorts
  * there — with a handful of groups (o4's five market segments) one task
  * per group ends up sorting billions of rows at 100 TB. Here every
  * partition keeps a k-row buffer per group, the shuffle moves ≤ k rows
  * per (partition, group), and nothing is ever globally sorted. Ties
  * resolve by the struct's later fields exactly like the window's ORDER
  * BY tiebreaks, so results are identical when the ordering is total
  * (include a unique key field, as o4 does).
  *
  * State is strictly bounded: k copied rows per group. Insertion is a
  * linear shift into a sorted k-array — optimal for the small k this
  * exists for (top-3 per segment); a heap would win only for large k.
  */
case class TopKStructs(
    child: Expression,
    kExpr: Expression,
    descsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStructs.State] {

  override def children: Seq[Expression] = Seq(child, kExpr, descsExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType, descsExpr.dataType) match {
      case (StructType(fields), IntegerType, ArrayType(BooleanType, _))
          if kExpr.foldable && descsExpr.foldable =>
        if (descsExpr.eval(null).asInstanceOf[ArrayData]
            .numElements() != fields.length)
          TypeCheckResult.TypeCheckFailure(
            "topk_structs: descs length must equal the struct's field count")
        else fields.map(_.dataType)
          .map(TypeUtils.checkForOrderingExpr(_, "topk_structs"))
          .find(_.isFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
      case t => TypeCheckResult.TypeCheckFailure(
        s"topk_structs expects (struct, foldable int, foldable array<boolean>), got $t")
    }

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]
  @transient private lazy val fieldTypes: Array[DataType] =
    structType.fields.map(_.dataType)
  @transient private lazy val ordering: Ordering[InternalRow] = {
    val descs = descsExpr.eval(null).asInstanceOf[ArrayData].toBooleanArray()
    val fieldOrds = fieldTypes.map(TypeUtils.getInterpretedOrdering)
    (a: InternalRow, b: InternalRow) => {
      var i = 0
      var c = 0
      while (c == 0 && i < fieldTypes.length) {
        val av = a.get(i, fieldTypes(i))
        val bv = b.get(i, fieldTypes(i))
        c =
          if (av == null && bv == null) 0
          else if (av == null) -1 // nulls first, like SortOrder's default
          else if (bv == null) 1
          else fieldOrds(i).compare(av, bv)
        if (descs(i)) c = -c
        i += 1
      }
      c
    }
  }
  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(fieldTypes)

  override def createAggregationBuffer(): TopKStructs.State =
    new TopKStructs.State(new Array[InternalRow](k), 0)

  override def update(b: TopKStructs.State, input: InternalRow): TopKStructs.State = {
    val v = child.eval(input)
    // a null struct carries no rank information — skipped
    if (v != null) b.insert(toUnsafe(v.asInstanceOf[InternalRow]).copy(), ordering)
    b
  }

  override def merge(b: TopKStructs.State, o: TopKStructs.State): TopKStructs.State = {
    var i = 0
    while (i < o.n) { b.insert(o.rows(i), ordering); i += 1 }
    b
  }

  override def eval(b: TopKStructs.State): Any =
    new GenericArrayData(java.util.Arrays.copyOf(
      b.rows.asInstanceOf[Array[AnyRef]], b.n))

  override def serialize(b: TopKStructs.State): Array[Byte] = {
    val rows = (0 until b.n).map(i => b.rows(i).asInstanceOf[UnsafeRow])
    val size = 4 + rows.map(4 + _.getSizeInBytes).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(b.n)
    rows.foreach { r =>
      bb.putInt(r.getSizeInBytes)
      r.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStructs.State = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val rows = new Array[InternalRow](k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val r = new UnsafeRow(fieldTypes.length)
      r.pointTo(rowBytes, len)
      rows(i) = r
      i += 1
    }
    new TopKStructs.State(rows, n)
  }

  override def withNewMutableAggBufferOffset(off: Int): TopKStructs =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKStructs =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStructs =
    copy(child = newChildren(0), kExpr = newChildren(1),
      descsExpr = newChildren(2))
}

object TopKStructs {
  /** rows(0..n-1) sorted ascending under the aggregate's ordering. */
  final class State(val rows: Array[InternalRow], var n: Int) {
    def insert(r: InternalRow, ord: Ordering[InternalRow]): Unit = {
      if (n == rows.length && ord.compare(r, rows(n - 1)) >= 0) return
      var i = math.min(n, rows.length - 1)
      while (i > 0 && ord.compare(r, rows(i - 1)) < 0) {
        rows(i) = rows(i - 1)
        i -= 1
      }
      rows(i) = r
      if (n < rows.length) n += 1
    }
  }
}
