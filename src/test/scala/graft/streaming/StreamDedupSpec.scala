package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// top-level: an inner case class has no encoder-resolvable outer scope
case class DedupDoc(doc_id: Long, h: String, ts: Timestamp)

class StreamDedupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def Doc(id: Long, h: String, t: Timestamp) = DedupDoc(id, h, t)

  test("streaming exact dedup keeps the first arrival per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[DedupDoc]
    val query = StreamDedup.dedupForever(input.toDF(), Seq("h"))
      .writeStream.format("memory").queryName("dedup_forever")
      .outputMode("append").start()
    input.addData(
      Doc(1L, "a", ts("2024-01-01 10:00:00")),
      Doc(2L, "b", ts("2024-01-01 10:01:00")),
      Doc(3L, "a", ts("2024-01-01 10:02:00"))) // dup of h=a in-batch
    query.processAllAvailable()
    input.addData(Doc(4L, "b", ts("2024-01-01 11:00:00"))) // dup across batches
    query.processAllAvailable()
    query.stop()
    val got = spark.table("dedup_forever").as[DedupDoc].collect()
      .map(d => d.h -> d.doc_id).toMap
    assert(got == Map("a" -> 1L, "b" -> 2L)) // first arrivals only
  }

  test("watermarked dedup bounds state: in-window dups drop, post-window key re-emits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[DedupDoc]
    val query = StreamDedup.dedupWithinWatermark(
        input.toDF(), Seq("h"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    input.addData(
      Doc(1L, "a", ts("2024-01-01 10:00:00")),
      Doc(2L, "a", ts("2024-01-01 10:03:00"))) // in-window dup → dropped
    query.processAllAvailable()
    // advance event time far past the watermark window, expiring h=a state
    input.addData(Doc(3L, "z", ts("2024-01-01 12:00:00")))
    query.processAllAvailable()
    // a fresh h=a long after the window: state was expired → re-emits
    // (the documented semantics of the bounded-state arm)
    input.addData(Doc(4L, "a", ts("2024-01-01 12:01:00")))
    query.processAllAvailable()
    query.stop()
    val got = spark.table("dedup_wm").as[DedupDoc].collect().map(_.doc_id).toSet
    assert(got == Set(1L, 3L, 4L))
  }

  test("TTL dedup processor: first arrival emits, in-TTL dups drop, expiry re-admits") {
    // the transformWithState plan itself needs a RocksDB-backed run (see
    // the dedupTtl scaladoc for why that e2e is out of the local suite);
    // the PROCESSOR contract is checked here against a stub ValueState
    // whose expiry we control — exactly what the TTL store does for real.
    var state: Option[Boolean] = None
    val stub = new org.apache.spark.sql.streaming.ValueState[Boolean] {
      def exists(): Boolean = state.isDefined
      def get(): Boolean = state.get
      def update(v: Boolean): Unit = state = Some(v)
      def clear(): Unit = state = None
    }
    val p = new StreamDedup.TtlDedupProcessor[DedupDoc](
      java.time.Duration.ofMillis(1500),
      Ordering.by((x: DedupDoc) => (x.ts.getTime, x.doc_id))) {
      override def init(
          om: org.apache.spark.sql.streaming.OutputMode,
          tm: org.apache.spark.sql.streaming.TimeMode): Unit = ()
    }
    val seenField = classOf[StreamDedup.TtlDedupProcessor[_]]
      .getDeclaredField("seen")
    seenField.setAccessible(true)
    seenField.set(p, stub)
    def feed(docs: DedupDoc*): Seq[DedupDoc] =
      p.handleInputRows("a", docs.iterator, null).toSeq
    // batch 1: first arrival emits, in-batch dup drops
    val b1 = feed(Doc(1L, "a", ts("2024-01-01 10:00:00")),
      Doc(2L, "a", ts("2024-01-01 10:01:00")))
    assert(b1.map(_.doc_id) == Seq(1L))
    // representative is ord-least, NOT iterator-first: a shuffled arrival
    // order of the same batch yields the same survivor (ADVICE r11)
    state = None
    val b1r = feed(Doc(2L, "a", ts("2024-01-01 10:01:00")),
      Doc(1L, "a", ts("2024-01-01 10:00:00")))
    assert(b1r.map(_.doc_id) == Seq(1L))
    // batch 2 within TTL: state present → suppressed
    assert(feed(Doc(3L, "a", ts("2024-01-01 10:02:00"))).isEmpty)
    // the store expires the key after the TTL → next arrival re-emits
    state = None
    val b3 = feed(Doc(4L, "a", ts("2024-01-01 10:30:00")))
    assert(b3.map(_.doc_id) == Seq(4L))
    // and an empty iterator never touches state
    state = None
    assert(feed().isEmpty && state.isEmpty)
  }
}
