package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BigramLmStats, BigramRepStats, CharEntropyStats, CollectBoundedLongs, Md5Prefix60, MinhashSig, ShingleCodes, SimhashVotes, TopKStructs, VecDot}

/** Engine extensions, activated with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (done by
  * `Tables.configure`) — the public registration path for custom Catalyst
  * expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // tier-(c) surface: the as-of join as a first-class logical node,
    // lowered during analysis (see graft.plans.AsOfJoinPlan)
    ext.injectResolutionRule(s => new graft.plans.ResolveAsOfJoin(s))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("bigram_lm_stats"),
      new ExpressionInfo(classOf[BigramLmStats].getName, "bigram_lm_stats"),
      (children: Seq[Expression]) =>
        BigramLmStats(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("bigram_rep_stats"),
      new ExpressionInfo(classOf[BigramRepStats].getName, "bigram_rep_stats"),
      (children: Seq[Expression]) => BigramRepStats(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("char_entropy_stats"),
      new ExpressionInfo(classOf[CharEntropyStats].getName, "char_entropy_stats"),
      (children: Seq[Expression]) => CharEntropyStats(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (children: Seq[Expression]) => Md5Prefix60(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("shingle_codes"),
      new ExpressionInfo(classOf[ShingleCodes].getName, "shingle_codes"),
      (children: Seq[Expression]) => ShingleCodes(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("collect_bounded"),
      new ExpressionInfo(classOf[CollectBoundedLongs].getName, "collect_bounded"),
      (children: Seq[Expression]) =>
        CollectBoundedLongs(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("topk_structs"),
      new ExpressionInfo(classOf[TopKStructs].getName, "topk_structs"),
      (children: Seq[Expression]) =>
        TopKStructs(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_prints"),
      new ExpressionInfo(classOf[graft.functions.WinnowPrints].getName,
        "winnow_prints"),
      (children: Seq[Expression]) =>
        graft.functions.WinnowPrints(children.head)))
    // Spark ships these two for its own runtime-filter rewrites but does
    // not register them in the public FunctionRegistry; exposing them via
    // the extension gives queries the classic bloom semi-join reduction
    // (build a fixed-size sketch of the small side, prefilter the big side
    // in codegen, exact-join only the survivors) without reimplementing
    // the sketch.
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash_votes"),
      new ExpressionInfo(classOf[SimhashVotes].getName, "simhash_votes"),
      (children: Seq[Expression]) => SimhashVotes(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) =>
        MinhashSig(children(0), children(1), children(2), children(3))))
  }
}
