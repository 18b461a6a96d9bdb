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

  test("S10 dialect SQL: MySQL backticks vs ANSI quotes; identifiers validated") {
    val my = "jdbc:mysql://host/db"
    val dy = "jdbc:derby:memory:x"
    assert(Dims.Sql.select("mercados", Seq("id", "estado"), Some("id = ?"), my)
      == "SELECT `id`, `estado` FROM `mercados` WHERE id = ?")
    // ANSI mix mirrors Spark's JDBC writer DDL: table unquoted
    // (case-folded), columns quoted (case-sensitive)
    assert(Dims.Sql.select("mercados", Nil, None, dy)
      == "SELECT * FROM mercados")
    assert(Dims.Sql.insert("mercados", Seq("id", "estado"), my)
      == "INSERT INTO `mercados` (`id`, `estado`) VALUES (?, ?)")
    assert(Dims.Sql.update("mercados", Seq("estado"), Seq("id"), my)
      == "UPDATE `mercados` SET `estado` = ? WHERE `id` = ?")
    assert(Dims.Sql.update("mercados", Seq("estado", "nombre"), Seq("id", "mercado"), dy)
      == """UPDATE mercados SET "estado" = ?, "nombre" = ? WHERE "id" = ? AND "mercado" = ?""")
    // injection surface closed: identifiers must be plain
    intercept[IllegalArgumentException] {
      Dims.Sql.select("mercados; DROP TABLE x", Nil, None, my)
    }
  }

  test("S10 batch UPDATE-by-key over real JDBC (the reference's literal path)") {
    val urlS = "jdbc:derby:memory:dimsdb2;create=true"
    val url = Some(urlS)
    val dim = Seq((1, "diario", "active"), (2, "intra", "active"),
      (3, "mic", "active")).toDF("id", "mercado", "estado")
    Dims.write(dim, "mercados2", url, "")
    // update rows 2 and 3 by key; row 1 untouched; key 9 matches nothing
    val updates = Seq((2, "intra", "retired"), (3, "mic", "paused"),
      (9, "nope", "ghost")).toDF("id", "mercado", "estado")
    Dims.updateByKeyJdbc(updates, "mercados2", Seq("id"), urlS, batchSize = 2)
    val got = Dims.read(spark, "mercados2", url, "")
      .select("id", "estado").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "active", 2 -> "retired", 3 -> "paused"))
  }
}
