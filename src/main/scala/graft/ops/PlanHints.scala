package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Shared planner-hint policy for checkpoint-backed small frames.
  *
  * localCheckpoint-backed DataFrames surface as LogicalRDD leaves with no
  * size statistics, so Catalyst assumes they are huge and shuffle-
  * partitions BOTH sides of a join even when one side is a bounded
  * score/rank table (measured: q_textrank 1.4 GB shuffle-write per run at
  * 100× vs 0.8 MB hinted — SCALE.md round 12 cont. 3). When the caller
  * KNOWS the row count (free off the materialized checkpoint), a
  * broadcast hint under one shared threshold restores the plan the
  * statistics would have produced. One definition so the threshold is
  * retuned in one place, not per operator.
  */
object PlanHints {

  /** Rows under which a narrow (2–3 column, fixed-width) frame is safe to
    * broadcast: ~16 B/row → ≤ ~8 MB serialized, far under executor
    * broadcast budgets. Deliberately conservative — a frame over the
    * threshold keeps the keyed-shuffle plan, which is the correct shape
    * for genuinely large sides.
    */
  val SmallFrameRows = 500000L

  /** `df` with a broadcast hint iff `rows` (the caller's exact count) is
    * within [[SmallFrameRows]]; unchanged otherwise.
    */
  def maybeBroadcastSmall(df: DataFrame, rows: Long): DataFrame =
    if (rows <= SmallFrameRows) broadcast(df) else df
}
