package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of one hot key + a long tail
  private def skewed = (Seq.fill(10000)(("hot", 1.0)) ++
    (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("k", "v")

  test("salted aggregation equals the direct aggregation") {
    val direct = skewed.groupBy("k").agg(sum("v").as("total"))
      .as[(String, Double)].collect().toMap
    val salted = Skew.saltedSum(skewed, Seq("k"), "v", salts = 8)
      .as[(String, Double)].collect().toMap
    assert(salted == direct)
    assert(salted("hot") == 10000.0)
  }

  test("constant-value hot key still spreads across salts") {
    // the degenerate case: every hot row carries the SAME value — a salt
    // derived from the value alone would collapse to one reducer and the
    // mitigation would silently do nothing
    val constHot = Seq.fill(5000)(("hot", 0.0)).toDF("k", "v")
    val spread = constHot.select(Skew.rowSalt("v", 8).as("s"))
      .distinct().count()
    assert(spread > 1, s"salt collapsed to $spread distinct value(s)")
    val total = Skew.saltedSum(constHot, Seq("k"), "v", salts = 8)
      .as[(String, Double)].collect().toMap
    assert(total == Map("hot" -> 0.0))
  }

  test("salted dim join equals the direct join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("dk", "label")
    val direct = skewed.join(dim, col("k") === col("dk"))
      .groupBy("label").count().as[(String, Long)].collect().toMap
    val salted = Skew.saltedDimJoin(skewed, dim, "k", "dk", salts = 8)
      .groupBy("label").count().as[(String, Long)].collect().toMap
    assert(salted == direct)
    assert(salted("H") == 10000L)
    // the hot key's rows really spread across salts
    val spread = Skew.saltedDimJoin(skewed, dim, "k", "dk", salts = 8)
      .filter(col("k") === "hot")
      .select(pmod(hash(col("k"), monotonically_increasing_id()), lit(8)))
    assert(spread.distinct().count() > 1)
  }
}
