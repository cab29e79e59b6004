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

  /** Bounded wait for the observed metrics: they arrive via the ASYNC
    * listener bus (the action completes first, the bus delivers
    * SQLExecutionEnd after), and `Observation.get` has no timeout — a
    * bus that dropped the terminal event under an event storm would hang
    * the iteration forever. The waiter runs on a daemon thread; past the
    * timeout the caller falls back to an explicit aggregate.
    */
  private val waiter = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "graft-ckpt-observation-waiter")
      t.setDaemon(true)
      t
    })

  /** `ckpt(df)` + the observed `metrics` of the materialization job.
    * Every metric Column must be aliased (`.as("name")`); read results
    * from the returned map by those names. `ckpt` must be an EAGER
    * checkpointing function (localCheckpoint(true) / checkpoint(true))
    * — a lazy one would never complete the observation. If the listener
    * bus fails to deliver the metrics within 60 s, the probe falls back
    * to one explicit aggregation job over the (already materialized)
    * checkpoint — exactly the pre-r16 behavior, same values.
    */
  def withMetrics(df: DataFrame, metrics: Seq[Column],
      ckpt: DataFrame => DataFrame = _.localCheckpoint(true))
      : (DataFrame, Map[String, Any]) = {
    val obs = Observation()
    val out = ckpt(df.observe(obs, metrics.head, metrics.tail: _*))
    val fut = waiter.submit(new java.util.concurrent.Callable[Map[String, Any]] {
      override def call(): Map[String, Any] = obs.get
    })
    val w0 = System.nanoTime()
    val m =
      try {
        val r = fut.get(60L, java.util.concurrent.TimeUnit.SECONDS)
        val waitMs = (System.nanoTime() - w0) / 1000000L
        // slow listener-bus delivery is a measurable anti-win: surface it
        if (waitMs > 250L) System.err.println(
          s"[ckpt] observation delivery took ${waitMs} ms (listener bus lag)")
        r
      }
      catch {
        case _: java.util.concurrent.TimeoutException =>
          fut.cancel(true)
          val row = out.agg(metrics.head, metrics.tail: _*).head()
          row.schema.fieldNames.zipWithIndex
            .map { case (n, i) => n -> row.get(i) }.toMap
        case e: java.util.concurrent.ExecutionException =>
          throw e.getCause
      }
    (out, m)
  }
}
