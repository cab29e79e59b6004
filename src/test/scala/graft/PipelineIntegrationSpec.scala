package graft

import org.apache.spark.sql.functions._

import graft.ops.{Bloom, Curation, Dedup, Reservoir}

/** The whole training-data pipeline composed end-to-end from the library
  * ops, on the real documents table: quality gate → PII redaction → exact
  * dedup → near-dup closure (pairs → connected components → keep one per
  * cluster) → benchmark decontamination → stratified sample → token-budget
  * packing. Each stage's invariants are asserted on the actual
  * intermediate, so a regression in any op breaks this spec with the stage
  * named — the "does it all compose" test the per-op specs cannot give.
  */
class PipelineIntegrationSpec extends SparkSuite {

  test("ingest → clean → dedup → decontaminate → sample → pack composes") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()
    assert(total > 0)

    // 1. quality gate: keep docs with a sane token count
    val ntok = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long")
    val quality = docs.withColumn("n_tok", ntok).filter(col("n_tok") >= 5)
    val nQuality = quality.count()
    assert(nQuality > 0 && nQuality <= total)

    // 2. PII redaction is a pure rewrite: row count unchanged
    val redacted = graft.ops.Privacy.redact(quality, "text")
    assert(redacted.count() == nQuality)

    // 3. exact dedup by text
    val exact = Dedup.exact(redacted, "doc_id", Seq("text"))
    val nExact = exact.count()
    assert(nExact <= nQuality)

    // 4. near-dup closure: minhash candidate pairs → CC → keep one per cluster
    val pairs = Dedup.minhashLshPairs(exact, "doc_id", "text")
    val deduped = Curation.applyDedup(exact, pairs, "doc_id")
    val nDeduped = deduped.count()
    val nClustered = pairs.select(col("a").as("id")).union(pairs.select(col("b").as("id")))
      .distinct().count()
    assert(nDeduped < nExact || nClustered == 0)
    assert(nDeduped >= nExact - nClustered) // at most |clustered| - #clusters drop

    // 5. decontaminate against a "benchmark" (first 50 docs) via bloom
    //    fingerprints — exact-anti semantics
    val bench = docs.filter(col("doc_id") < 50).select(md5(col("text")).as("fp"))
    val withFp = deduped.withColumn("fp", md5(col("text")))
    val clean = Bloom.bloomAntiJoin(withFp, bench, "fp").drop("fp")
    val nClean = clean.count()
    assert(nClean <= nDeduped)

    // 6. exact-k per-language sample of the cleaned corpus
    val sample = Reservoir.sampleK(clean, "lang", "doc_id", k = 10)
    val langSizes = clean.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLang = sample.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == langSizes.map { case (l, n) => l -> math.min(10L, n) })

    // 7. pack the sampled docs into token-budget shards; every shard except
    //    possibly each language's last holds > 0 docs and the assignment is
    //    the exclusive-prefix greedy packer (monotone shard ids per lang)
    val sampledDocs = clean.join(sample.select("doc_id"), Seq("doc_id"))
    val packed = Curation.packByBudget(
      sampledDocs.select(col("lang"), col("doc_id"), col("n_tok")),
      unitCol = "lang", orderCol = "doc_id", weightCol = "n_tok", budget = 512L)
    val byLang = packed.orderBy("lang", "doc_id")
      .select("lang", "shard")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    byLang.groupBy(_._1).values.foreach { shards =>
      val ids = shards.map(_._2)
      assert(ids.zip(ids.tail).forall { case (a, b) => a <= b }, "shards not monotone")
    }
    assert(packed.count() == sample.count())
  }
}
