package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join: for every left row, the latest right row
  * with the same key and rightTime <= leftTime.
  *
  * Spark has no native as-of join; the scalable composition is the
  * union + last-observation-carried-forward window:
  *   1. tag both sides and union their (key, time, payload) projections;
  *   2. one shuffle: partition by key, order by (time, tag) — right rows
  *      sort BEFORE left rows at equal timestamps so "<=" matches;
  *   3. `last(payload, ignoreNulls)` over the unbounded-preceding frame
  *      carries the latest right payload forward;
  *   4. keep left rows.
  * One shuffle total, no range-explode, no per-key driver loop — at 100 TB
  * this is one sort-merge pass per key partition (the window reuses the
  * hash partitioning, no extra exchange).
  */
object AsofJoin {

  /** @param left      probe side
    * @param right     build side (its latest at-or-before row is attached)
    * @param key       equi-join key column name (present on both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right` (same type as leftTime)
    * @param payload   right-side columns to attach (null until first match);
    *                  names must not collide with left's columns
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame =
    asofKeys(left, right, Seq(key), leftTime, rightTime, payload)

  /** Grouped (composite-key) as-of join: same LOCF composition, partitioned
    * by ALL of `keys` — e.g. (user, day) attaches the latest same-day match
    * only. Still one shuffle; the window reuses the hash partitioning.
    */
  def asofKeys(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one equi key")
    val lRest = left.columns.toSeq.filterNot(keys.contains)
    val lu = left.select(
      keys.map(col) ++ (col(leftTime).as("__t") +: lit(1).as("__tag") +:
        (payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p")) ++
          lRest.map(col))): _*)
    val ru = right.select(
      keys.map(col) ++ (col(rightTime).as("__t") +: lit(0).as("__tag") +:
        (payload.map(p => col(p).as(s"__p_$p")) ++
          lRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)))): _*)
    // Ordering ends with the payload columns as a deterministic tiebreaker:
    // when several right rows share the same (key, time), `last(...)` would
    // otherwise attach whichever sorted last under the ambient partitioning —
    // nondeterministic across runs. With the tiebreaker the largest payload
    // tuple wins on every run (right rows: __tag=0 sorts them before left
    // rows at equal time, so "<=" matches are preserved; left rows all have
    // null payloads so the tiebreaker never reorders a left row relative to
    // the right rows it must follow at equal (__t, __tag)).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t") +: col("__tag") +: payload.map(p => col(s"__p_$p")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .select(
        keys.map(col) ++ (col("__tag") +:
          (lRest.map(col) ++
            payload.map(p => last(col(s"__p_$p"), ignoreNulls = true).over(w).as(p)))): _*)
      .filter(col("__tag") === 1)
      .drop("__tag")
  }
}
