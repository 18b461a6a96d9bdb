package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Distinct-collect with a HARD state bound: `collect_bounded(e, k)`
  * gathers distinct BIGINT values of `e` per group but never holds more
  * than k+1 of them — the moment a group exceeds k distinct values it is
  * marked overflowed and every further input is dropped on the floor.
  * Overflowed groups return NULL; surviving groups return the exact
  * distinct set (ascending, so the result is deterministic under any
  * partitioning).
  *
  * This is the aggregation the frequency-banded inverted-index pattern
  * needs (llm_ngram_jaccard: "docs sharing a shingle seen in 2-4 docs
  * become candidates"): the two-pass form — count per key, join the
  * surviving keys back, collect — scans the posting stream twice and pays
  * two shuffles; an unbounded collect_set fuses the passes but
  * materializes every stop-shingle's full doc list in one agg buffer, the
  * exact unbounded-state hazard ADVICE r6 flagged. Bounding the buffer at
  * k+1 longs makes the fused single-pass form safe at ANY corpus size:
  * a shingle shared by a million documents costs 5 longs, not a
  * million-element array. Map-side partial aggregation works unchanged —
  * merge saturates at k+1 and propagates the overflow.
  */
case class CollectBoundedLongs(
    child: Expression,
    limitExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectBoundedLongs.State] {

  override def children: Seq[Expression] = Seq(child, limitExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, limitExpr.dataType) match {
      case (LongType, IntegerType) if limitExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "collect_bounded expects (bigint, foldable int limit)")
    }

  @transient private lazy val limit: Int =
    limitExpr.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): CollectBoundedLongs.State =
    new CollectBoundedLongs.State(new Array[Long](limit + 1), 0)

  override def update(b: CollectBoundedLongs.State,
      input: InternalRow): CollectBoundedLongs.State = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: CollectBoundedLongs.State,
      o: CollectBoundedLongs.State): CollectBoundedLongs.State = {
    if (o.n < 0) b.n = -1
    else {
      var i = 0
      while (i < o.n && b.n >= 0) { b.add(o.vals(i)); i += 1 }
    }
    b
  }

  override def eval(b: CollectBoundedLongs.State): Any =
    if (b.n < 0) null
    else {
      val out = java.util.Arrays.copyOf(b.vals, b.n)
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }

  override def serialize(b: CollectBoundedLongs.State): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * math.max(b.n, 0))
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CollectBoundedLongs.State = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val vals = new Array[Long](limit + 1)
    var i = 0
    while (i < n) { vals(i) = bb.getLong; i += 1 }
    new CollectBoundedLongs.State(vals, n)
  }

  override def withNewMutableAggBufferOffset(off: Int): CollectBoundedLongs =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CollectBoundedLongs =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectBoundedLongs =
    copy(child = newChildren(0), limitExpr = newChildren(1))
}

object CollectBoundedLongs {
  /** n = element count, or -1 once the group overflows the limit.
    * vals holds ≤ limit+1 distinct elements (linear membership scan —
    * the whole point is that the set stays tiny).
    */
  final class State(val vals: Array[Long], var n: Int) {
    def add(v: Long): Unit = {
      if (n < 0) return
      var i = 0
      while (i < n) { if (vals(i) == v) return; i += 1 }
      vals(n) = v
      n += 1
      if (n == vals.length) n = -1 // limit+1 distinct ⇒ overflowed
    }
  }
}
