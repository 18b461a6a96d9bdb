package graft

import graft.queries.LlmOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The r15 adaptive candidate grain: a multiplicity probe routes the
  * dedup/ANN generators between the direct id-grain plan (multiplicity
  * ≈ 1 — no content-hash exchange, no expansion joins) and the r14
  * content-grain plan (the sf10 re-crawl-bomb survivor). The two plans
  * must be OBSERVABLY IDENTICAL — the probe picks a physical shape,
  * never semantics — so every dispatched operator is pinned here, both
  * arms forced explicitly, compared as exact row sets.
  */
class AdaptiveGrainSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("grain decision: unique corpus → id grain; re-crawl bomb → content") {
    assert(LlmOps.idGrainDecision(values = 5000, distinct = 4992,
      maxCopies = 2), "ratio 0.9984 / max 2 must take the id grain")
    assert(!LlmOps.idGrainDecision(values = 500000, distinct = 5000,
      maxCopies = 100), "100× multiplicity must take the content grain")
    // the skew blind spot the ratio alone would miss: one text with a
    // huge copy count in an otherwise-unique corpus
    assert(!LlmOps.idGrainDecision(values = 1000000, distinct = 990001,
      maxCopies = 10000), "ratio 0.99 but one 10^4-copy text → content")
    // empty corpus: either grain is trivially fine; id grain is cheaper
    assert(LlmOps.idGrainDecision(0, 0, 0))
  }

  test("probe routes the test corpus to the id grain") {
    assert(LlmOps.textIdGrainOk(spark, sfDir))
    assert(LlmOps.vecIdGrainOk(spark, sfDir))
  }

  test("minhash pairs: id grain == content grain") {
    val id = rows(LlmOps.minhashPairsIdGrain(spark, sfDir))
    val ct = rows(LlmOps.minhashPairsContentGrain(spark, sfDir))
    assert(id == ct)
  }

  test("minhash pairs with pair predicate: id grain == content grain") {
    val pred = Some((x: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column) => x % 2 === 0 && y % 2 === 0)
    val id = rows(LlmOps.minhashPairsIdGrain(spark, sfDir, pairPred = pred))
    val ct = rows(LlmOps.minhashPairsContentGrain(spark, sfDir,
      pairPred = pred))
    assert(id == ct)
  }

  test("dedup clusters: id grain == text grain") {
    val id = rows(LlmOps.dedupClustersIdGrain(spark, sfDir))
    val tx = rows(LlmOps.dedupClustersTextGrain(spark, sfDir))
    assert(id == tx)
  }

  test("minhash recall: id grain == text grain") {
    val id = rows(LlmOps.minhashRecallIdGrain(spark, sfDir))
    val tx = rows(LlmOps.minhashRecallTextGrain(spark, sfDir))
    assert(id == tx)
  }

  test("simhash near-dup: id grain == signature grain") {
    val id = rows(LlmOps.simhashNearDup(spark, sfDir, idGrain = true))
    val sg = rows(LlmOps.simhashNearDup(spark, sfDir, idGrain = false))
    assert(id == sg)
  }

  test("embedding near-dup: id grain == vector grain") {
    val emb = Tables.embeddings(spark, sfDir)
    def run(g: Boolean) = rows(graft.llm.Similarity.nearDupPairs(
      emb, dims = 64, nBits = 4, nTables = 2, tau = 0.2, roundScale = 4,
      idGrain = g))
    assert(run(true) == run(false))
  }

  test("grain equivalence holds on a duplicate-heavy corpus too") {
    // replicate every doc 3× with offset ids — multiplicity 3 everywhere,
    // the regime where the arms take genuinely different plans. The probe
    // would route this to the content grain; the id-grain arm must still
    // agree (the probe is a performance choice, not a correctness guard
    // at this multiplicity).
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val n = 100000L
    val dup = docs
      .unionByName(docs.select((col("doc_id") + n).as("doc_id"), col("text")))
      .unionByName(docs.select((col("doc_id") + 2 * n).as("doc_id"), col("text")))
    val toks = Some(dup.select(col("doc_id"),
      split(col("text"), " ").as("l")))
    val id = rows(LlmOps.minhashPairsIdGrain(spark, sfDir, toks = toks))
    val ct = rows(LlmOps.minhashPairsContentGrain(spark, sfDir, toks = toks))
    assert(id == ct)
    assert(id.nonEmpty, "3× replication must produce duplicate pairs")
  }
}
