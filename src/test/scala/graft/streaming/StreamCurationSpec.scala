package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// top-level: an inner case class has no encoder-resolvable outer scope
case class CurDoc(doc_id: Long, text: String)

class StreamCurationSpec extends SparkSpec {

  private val docs = Seq(
    CurDoc(1L, "the quick brown fox jumps over the lazy dog again and again"),
    CurDoc(2L, "ping me at dev.user@example.com or call 555-0107 for the data"),
    CurDoc(3L, "too short")) // under the token gate

  test("streaming curation matches the batch computation row for row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[CurDoc]
    val query = StreamCuration.curate(input.toDF(), minTokens = 5)
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    input.addData(docs: _*)
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("curated")
      .select($"doc_id", $"n_tok", $"stop_ratio", $"clean_text")
      .as[(Long, Int, Double, String)].collect().toSet
    val batch = StreamCuration.curate(docs.toDF(), minTokens = 5)
      .select($"doc_id", $"n_tok", $"stop_ratio", $"clean_text")
      .as[(Long, Int, Double, String)].collect().toSet
    assert(streamed == batch, "stream/batch outputs diverge")
    assert(streamed.map(_._1) == Set(1L, 2L)) // doc 3 gated out
    val cleaned = streamed.find(_._1 == 2L).get._4
    assert(cleaned.contains("<EMAIL>") && cleaned.contains("<PHONE>"))
    assert(!cleaned.contains("@") && !cleaned.contains("555-"))
  }
}
