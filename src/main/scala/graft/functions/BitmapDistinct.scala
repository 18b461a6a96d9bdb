package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exact COUNT(DISTINCT key) as a MERGEABLE paged bitmap —
  * `bitmap_distinct(bigint) -> bigint` — the classic OLAP bitmap-distinct
  * (Doris BITMAP_UNION_COUNT / ClickHouse groupBitmap / Druid's bitmap
  * aggregators, re-expressed as a Spark `TypedImperativeAggregate`).
  *
  * Why it exists: Spark plans `count(DISTINCT k)` mixed with another
  * aggregate as either an Expand (every input row replicated per aggregate
  * family) or a two-level aggregation whose FIRST level groups by the
  * distinct key itself — for a high-cardinality key that pre-shuffle
  * partial aggregation barely reduces (a partition holding 190k of 800k
  * uniform keys keeps ~170k groups), so the plan pays a near-full-input
  * shuffle plus two large hash-map builds just to dedupe. A bitmap is the
  * dedup: update = set a bit (no hash probe), merge = OR, eval = popcount.
  * One aggregation pass, and the exchange carries fixed-size OR-able
  * state instead of the key stream — the same mergeability argument that
  * makes HLL the 100 TB APPROXIMATE arm makes the bitmap the 100 TB EXACT
  * arm for dense key domains (a18 pairs both and gates one with the other).
  *
  * State contract: pages of 4096 bits keyed by `key >> 12` in an open
  * hash table, so memory is ~(number of TOUCHED pages) × 512 B per group
  * per task. Dense dimension keys (TPC-H part/customer/order keys, the
  * reference's UP ids — generated 1..N, key-offset replicated at higher
  * SFs) touch ⌈domain/4096⌉ consecutive pages: ~64 KB per million keys,
  * strictly less state than the hash map the two-level plan builds for
  * the same data. For SPARSE/adversarial domains (random 64-bit hashes:
  * one page per key) this is the wrong tool by design — that regime is
  * what the HLL arm and the two-level exact plan are for; this aggregate
  * stays exact for any long key, it just stops being small.
  * NULL keys are ignored, matching COUNT(DISTINCT) semantics.
  */
case class BitmapDistinctLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapDistinctLong.State] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct expects an integral key, got ${other.simpleString}")
  }

  @transient private lazy val toLong: Any => Long = child.dataType match {
    case LongType    => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType   => v => v.asInstanceOf[Short].toLong
    case ByteType    => v => v.asInstanceOf[Byte].toLong
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): BitmapDistinctLong.State =
    new BitmapDistinctLong.State()

  override def update(b: BitmapDistinctLong.State,
      input: InternalRow): BitmapDistinctLong.State = {
    val v = child.eval(input)
    if (v != null) b.add(toLong(v))
    b
  }

  override def merge(b: BitmapDistinctLong.State,
      o: BitmapDistinctLong.State): BitmapDistinctLong.State = {
    b.or(o); b
  }

  override def eval(b: BitmapDistinctLong.State): Any = b.cardinality()

  override def serialize(b: BitmapDistinctLong.State): Array[Byte] =
    b.toBytes

  override def deserialize(bytes: Array[Byte]): BitmapDistinctLong.State =
    BitmapDistinctLong.State.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(off: Int): BitmapDistinctLong =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BitmapDistinctLong =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinctLong =
    copy(child = newChildren(0))
}

object BitmapDistinctLong {

  private final val PageBits = 4096   // bits per page
  private final val PageWords = PageBits / 64

  /** Open-addressed (pageIndex -> 64-word page) table. Linear probing on
    * a power-of-two array; pageIndex is `key >> 12` (arithmetic shift:
    * negative keys get negative page indices and work unchanged). The
    * EMPTY slot sentinel is an index paired with a null page array, not a
    * magic index value, so every possible long key is representable.
    */
  final class State {
    private var idx: Array[Long] = new Array[Long](16)
    private var pages: Array[Array[Long]] = new Array[Array[Long]](16)
    private var nPages: Int = 0

    private def page(pi: Long): Array[Long] = {
      var slot = (scala.util.hashing.byteswap64(pi) & (idx.length - 1)).toInt
      while (true) {
        val p = pages(slot)
        if (p == null) {
          if ((nPages + 1) * 4 > idx.length * 3) { grow(); return page(pi) }
          val np = new Array[Long](PageWords)
          idx(slot) = pi; pages(slot) = np; nPages += 1
          return np
        }
        if (idx(slot) == pi) return p
        slot += 1
        if (slot == idx.length) slot = 0
      }
      null // unreachable
    }

    private def grow(): Unit = {
      val oi = idx; val op = pages
      idx = new Array[Long](oi.length * 2)
      pages = new Array[Array[Long]](op.length * 2)
      var i = 0
      while (i < op.length) {
        if (op(i) != null) {
          var slot = (scala.util.hashing.byteswap64(oi(i)) & (idx.length - 1)).toInt
          while (pages(slot) != null) {
            slot += 1; if (slot == idx.length) slot = 0
          }
          idx(slot) = oi(i); pages(slot) = op(i)
        }
        i += 1
      }
    }

    def add(v: Long): Unit = {
      val p = page(v >> 12)
      val bit = (v & 4095).toInt
      p(bit >>> 6) |= 1L << (bit & 63)
    }

    def or(o: State): Unit = {
      var i = 0
      while (i < o.pages.length) {
        val op = o.pages(i)
        if (op != null) {
          val p = page(o.idx(i))
          var w = 0
          while (w < PageWords) { p(w) |= op(w); w += 1 }
        }
        i += 1
      }
    }

    def cardinality(): Long = {
      var total = 0L
      var i = 0
      while (i < pages.length) {
        val p = pages(i)
        if (p != null) {
          var w = 0
          while (w < PageWords) { total += java.lang.Long.bitCount(p(w)); w += 1 }
        }
        i += 1
      }
      total
    }

    /** Wire form: [nPages][pageIndex, 64 words]... — trailing zero words
      * per page are truncated (a short word count precedes each page), so
      * a partially-filled tail page costs its live prefix only.
      */
    def toBytes: Array[Byte] = {
      // Long accumulator: a pathologically sparse key domain (any long is
      // accepted) can touch enough pages that the wire size overflows an
      // Int, and ByteBuffer.allocate(negative) would fail with an opaque
      // IllegalArgumentException deep in task serialization. Fail with a
      // named, diagnosable error instead.
      var size = 4L
      var i = 0
      while (i < pages.length) {
        if (pages(i) != null) size += 8 + 2 + 8 * liveWords(pages(i))
        i += 1
      }
      if (size > Int.MaxValue - 16)
        throw new IllegalStateException(
          s"bitmap_distinct state too large to serialize ($size bytes): " +
          "the key domain is too sparse for the paged-bitmap exact " +
          "aggregate — use approx_count_distinct or densify the keys")
      val bb = java.nio.ByteBuffer.allocate(size.toInt)
      bb.putInt(nPages)
      i = 0
      while (i < pages.length) {
        val p = pages(i)
        if (p != null) {
          bb.putLong(idx(i))
          val lw = liveWords(p)
          bb.putShort(lw.toShort)
          var w = 0
          while (w < lw) { bb.putLong(p(w)); w += 1 }
        }
        i += 1
      }
      bb.array()
    }

    private def liveWords(p: Array[Long]): Int = {
      var lw = PageWords
      while (lw > 0 && p(lw - 1) == 0L) lw -= 1
      lw
    }
  }

  object State {
    def fromBytes(bytes: Array[Byte]): State = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val s = new State()
      var i = 0
      while (i < n) {
        val pi = bb.getLong
        val lw = bb.getShort.toInt
        val p = s.page(pi) // companion access: fill words directly
        var w = 0
        while (w < lw) { p(w) = bb.getLong; w += 1 }
        i += 1
      }
      s
    }
  }
}
