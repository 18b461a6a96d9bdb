package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class EmaSpec extends SparkSpec {

  private def ts(m: Int) = new Timestamp(1714557600000L + m * 60000L)

  /** The reference fold the stream must reproduce bit-for-bit. */
  private def fold(vs: Seq[Double]): Double =
    vs.tail.foldLeft(vs.head)((acc, v) => 0.25 * v + 0.75 * acc)

  test("streaming EMA equals the sequential fold across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ema.Point]
    val query = Ema.emaStream(input.toDS())
      .writeStream.format("memory").queryName("ema_sink")
      .outputMode("update").start()
    // two keys, values chosen non-dyadic so any op reordering would show;
    // batches arrive in event-time order (the operator's contract)
    val u1 = Seq(3.7, 1.1, 9.2, 0.3, 5.5, 2.8)
    val u2 = Seq(10.1, 0.7, 4.4)
    input.addData(
      Ema.Point(1L, 1L, ts(0), u1(0)), Ema.Point(1L, 2L, ts(1), u1(1)),
      Ema.Point(2L, 3L, ts(0), u2(0)))
    query.processAllAvailable()
    input.addData(
      Ema.Point(1L, 4L, ts(2), u1(2)), Ema.Point(1L, 5L, ts(3), u1(3)),
      Ema.Point(2L, 6L, ts(1), u2(1)), Ema.Point(2L, 7L, ts(2), u2(2)))
    query.processAllAvailable()
    input.addData(
      Ema.Point(1L, 8L, ts(4), u1(4)), Ema.Point(1L, 9L, ts(5), u1(5)))
    query.processAllAvailable()
    query.stop()
    // update mode re-emits per batch; the LAST row per key is the final state
    val out = spark.table("ema_sink").as[Ema.EmaOut].collect()
      .groupBy(_.user_id).map { case (k, rows) =>
        k -> rows.maxBy(_.n_events)
      }
    assert(out(1L).n_events == 6L && out(2L).n_events == 3L)
    // bit-identical, not approximately equal: same IEEE op sequence
    assert(out(1L).ema_last == fold(u1), s"${out(1L).ema_last} != ${fold(u1)}")
    assert(out(2L).ema_last == fold(u2))
  }

  test("within-batch arrival order does not matter (sorted before folding)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ema.Point]
    val query = Ema.emaStream(input.toDS())
      .writeStream.format("memory").queryName("ema_sink2")
      .outputMode("update").start()
    // one batch, shuffled arrival; (ts, event_id) sort must restore order
    input.addData(
      Ema.Point(5L, 3L, ts(2), 9.2),
      Ema.Point(5L, 1L, ts(0), 3.7),
      Ema.Point(5L, 2L, ts(1), 1.1))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("ema_sink2").as[Ema.EmaOut].collect()
    assert(out.length == 1)
    assert(out.head.ema_last == fold(Seq(3.7, 1.1, 9.2)))
  }
}
