package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed table reconciliation — classify every key as added / removed /
  * changed between two versions of a dataset (re-crawl vs previous crawl,
  * store vs its rebuild, pre- vs post-migration copy). The audit primitive
  * behind "what did this batch actually change", at the scale where
  * eyeballing is impossible and a full row-by-row compare is the budget.
  *
  * Shape: each side collapses to ONE row per key — `(cnt, hsum)` where
  * `hsum` is the sum of per-row md5-derived 48-bit value hashes — via a
  * map-side-combinable aggregation, then a single equi-join on the key
  * decides the class. Cost is one shuffle of each side keyed identically
  * (AQE plans a sort-merge join reusing both partitionings) and the output
  * holds only differing keys. Multiset-safe: duplicate keys compare as
  * (count, order-free hash sum), so row order and partitioning never
  * matter. The hash is md5-derived exactly like the dedup/simhash family,
  * so any engine can replay the classification for audit.
  *
  * Value columns are canonicalized as `concat_ws` over presence-prefixed
  * renderings in CALLER-GIVEN order; columns whose string rendering is
  * engine-ambiguous (raw doubles, timestamps) should be pre-cast by the
  * caller (the Q.scala conventions).
  */
object Diff {

  /** Field separator: a control char that cannot appear in the data and
    * renders as the same single UTF-8 byte in any engine (oracle side:
    * `chr(1)`).
    */
  private val Sep = "\u0001"

  /** 48-bit value hash of `cols` rendered as strings (md5-derived — the
    * engine-replayable convention of the dedup family). 48 bits, not 60:
    * hashes are SUMMED per key, and under ANSI SQL a long sum must not
    * overflow — 48-bit terms leave 2^15 rows of headroom per key. Each
    * column renders with a presence prefix (`v` + value / `n` for NULL) so
    * a NULL can never collide with any literal string.
    */
  def rowHash(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws(Sep,
      cols.map(c => coalesce(concat(lit("v"), c.cast("string")), lit("n"))): _*)), 1, 12),
      16, 10).cast("long")

  private def collapse(df: DataFrame, keyCols: Seq[String],
      valueCols: Seq[String], suffix: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(s"cnt$suffix"),
        sum(rowHash(valueCols.map(col))).as(s"hsum$suffix"))

  /** One row per key whose content differs between `a` (the OLD side) and
    * `b` (the NEW side): key columns + `change_type` in
    * {'added','removed','changed'}. Keys identical on both sides (same
    * multiset of value rows) are absent from the result.
    */
  def keyed(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty,
      "diff needs key and value columns")
    val left = collapse(a, keyCols, valueCols, "_a")
    val right = collapse(b, keyCols, valueCols, "_b")
      .withColumnsRenamed(keyCols.map(k => k -> s"__r_$k").toMap)
    // NULL-SAFE key equality: a NULL key is one addressable key like any
    // other (a plain equi-join would never match NULL to NULL and report
    // the same NULL-key content as added+removed on every diff)
    val cond = keyCols.map(k => col(k) <=> col(s"__r_$k")).reduce(_ && _)
    left.join(right, cond, "full_outer")
      .withColumn("change_type",
        when(col("cnt_a").isNull, "added")
          .when(col("cnt_b").isNull, "removed")
          .when(col("cnt_a") =!= col("cnt_b") ||
            col("hsum_a") =!= col("hsum_b"), "changed"))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(k =>
        coalesce(col(k), col(s"__r_$k")).as(k)) :+ col("change_type"): _*)
  }
}
