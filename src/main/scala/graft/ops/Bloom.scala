package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomExprs.mightContain

/** Broadcast-sketch prefiltered anti-join — the 100 TB decontamination
  * shape. A plain `corpus LEFT ANTI JOIN bad` shuffles the ENTIRE corpus by
  * key even when 99.9% of it matches nothing; with a Bloom filter of the
  * bad set broadcast to every task, rows the filter rules out ("definitely
  * not in bad" — the no-false-negative guarantee) are emitted straight from
  * the scan, and only the `fpp` fraction of maybe-rows pays the exact
  * anti-join confirm. The result EQUALS the exact anti-join: false
  * positives are removed by the confirm, false negatives cannot exist.
  *
  * Cost model: sketch size is ~1.2 bytes/item at fpp=1% regardless of key
  * width (a 1e9-row bad set ≈ 1.2 GB — size fpp to the driver/executor
  * budget, or shard the bad set); corpus-side shuffle shrinks from |corpus|
  * to ~fpp·|corpus| + |true matches|.
  */
object Bloom {

  /** `corpus` rows whose `key` does not appear in `bad(key)` — exact
    * left-anti semantics, Bloom-accelerated. Key must be string or bigint
    * (what `stat.bloomFilter` ingests).
    */
  def bloomAntiJoin(corpus: DataFrame, bad: DataFrame, key: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    // materialize the bad keys once: without this the bad subplan would
    // execute up to three times (count, sketch build, confirm join); the
    // checkpointed frame is keys-only and cleaned by the ContextCleaner
    // when the result is dropped
    val keys = bad.select(col(key)).localCheckpoint(true)
    val n = if (expectedItems > 0) expectedItems else keys.count()
    // an empty bad set means everything is clean — and stat.bloomFilter
    // NPEs on empty input (no partial sketch to merge), so short-circuit
    if (if (expectedItems > 0) keys.isEmpty else n == 0) return corpus
    val bf = keys.stat.bloomFilter(key, math.max(n, 1L), fpp)
    val probe = mightContain(col(key), bf)
    // null-key rows match nothing in a left-anti join, so they are KEPT —
    // the probe null-propagates (both filters would drop them), hence the
    // explicit isNull arm to preserve exact anti-join semantics
    val definitelyClean = corpus.filter(col(key).isNull || !probe)
    val confirmed = corpus.filter(probe)
      .join(keys.distinct(), Seq(key), "left_anti")
    definitelyClean.unionByName(confirmed)
  }

  /** `corpus` rows whose `key` DOES appear in `keep(key)` — exact
    * left-semi semantics, Bloom-accelerated (the keep-list counterpart of
    * [[bloomAntiJoin]]: rows the sketch rules out are dropped at the scan,
    * only the maybe-fraction pays the semi-join confirm).
    */
  def bloomSemiJoin(corpus: DataFrame, keep: DataFrame, key: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val keys = keep.select(col(key)).localCheckpoint(true)
    val n = if (expectedItems > 0) expectedItems else keys.count()
    // empty keep set selects nothing (and stat.bloomFilter NPEs on empty).
    // Null-key corpus rows need no special arm here: a left-semi join
    // drops them, and so does the null-propagating probe filter.
    if (if (expectedItems > 0) keys.isEmpty else n == 0) return corpus.limit(0)
    val bf = keys.stat.bloomFilter(key, math.max(n, 1L), fpp)
    corpus.filter(mightContain(col(key), bf))
      .join(keys.distinct(), Seq(key), "left_semi")
  }
}
