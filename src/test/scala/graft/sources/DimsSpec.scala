package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DimsSpec extends SparkSpec {
  import spark.implicits._

  test("S10 dim store roundtrip + update-by-key merge") {
    val store = tmpDir()
    val dim = Seq((1, "diario", "active"), (2, "intra", "active"))
      .toDF("id", "mercado", "estado")
    Dims.write(dim, "mercados", None, store)
    assert(Dims.read(spark, "mercados", None, store).count() == 2)
    // update row 2, leave row 1
    val updates = Seq((2, "intra", "retired")).toDF("id", "mercado", "estado")
    val merged = Dims.upsertByKey(spark, "mercados", updates, Seq("id"), None, store)
    val got = merged.select("id", "estado").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "active", 2 -> "retired"))
  }

  test("S10 real JDBC arm: roundtrip + update-by-key against embedded Derby") {
    // Derby ships with Spark; in-memory url = a real JDBC database without
    // any external service. Same Dims calls as the parquet arm.
    val url = Some("jdbc:derby:memory:dimsdb;create=true")
    val dim = Seq((1, "diario", "active"), (2, "intra", "active"))
      .toDF("id", "mercado", "estado")
    Dims.write(dim, "mercados", url, "")
    assert(Dims.read(spark, "mercados", url, "").count() == 2)
    val updates = Seq((2, "intra", "retired")).toDF("id", "mercado", "estado")
    val merged = Dims.upsertByKey(spark, "mercados", updates, Seq("id"), url, "")
    val got = merged.select("id", "estado").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "active", 2 -> "retired"))
  }
}
