package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Eager checkpoint that rides aggregate METRICS on the materialization
  * job itself (Spark's `Dataset.observe` / CollectMetrics), so an
  * iterative operator's per-round convergence probe — changed-row count,
  * edge-set checksum, survivor count — costs ZERO extra jobs instead of
  * one full probe job per round (optimization round 16, guide §1.2
  * "remove unnecessary passes": the probe re-scanned rows the checkpoint
  * job had just materialized).
  *
  * Why this is sound:
  *  - `Dataset.checkpoint`/`localCheckpoint` are `withAction`-wrapped
  *    (verified against the Spark 4.1.2 bytecode), so the execution
  *    fires QueryExecutionListeners and `Observation.get` completes with
  *    the metrics of exactly that job.
  *  - CollectMetrics values are exactly-once per partition (the
  *    scheduler folds accumulator updates only from the task attempt
  *    that completes a partition), so the observed aggregates equal what
  *    a separate aggregation job over the checkpointed rows would
  *    return.
  */
private[graft] object Ckpt {

  /** `ckpt(df)` + the observed `metrics` of the materialization job.
    * Every metric Column must be aliased (`.as("name")`); read results
    * from the returned map by those names. `ckpt` must be an EAGER
    * checkpointing function (localCheckpoint(true) / checkpoint(true))
    * — a lazy one would leave `Observation.get` blocked forever.
    */
  def withMetrics(df: DataFrame, metrics: Seq[Column],
      ckpt: DataFrame => DataFrame = _.localCheckpoint(true))
      : (DataFrame, Map[String, Any]) = {
    val obs = Observation()
    val out = ckpt(df.observe(obs, metrics.head, metrics.tail: _*))
    (out, obs.get)
  }
}
