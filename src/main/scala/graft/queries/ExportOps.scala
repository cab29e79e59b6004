package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Training-export queries (graft.ops.Export) under the hash gate:
  * leakage-free hash splits, the seeded deterministic corpus shuffle, and
  * balanced round-robin shard assignment by global rank. All md5-derived,
  * so DuckDB replays them bit-identically.
  */
object ExportOps {

  type Fn = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- content-stable train/val/test split: bucket = first 8 md5 hex
    //    digits of (doc_id | salt) mod 100. Re-running the pipeline with
    //    different partitioning/order CANNOT move a doc across splits ------
    ("q_split_assign",
      (s: SparkSession, d: String) =>
        graft.ops.Export.hashSplit(
            t(s, d, "documents").select("doc_id"), "doc_id", "split")
          .withColumn("bucket", graft.ops.Export.hashBucket(col("doc_id"), "split"))
          .select("doc_id", "bucket", "split")
          .orderBy("doc_id"),
      """WITH b AS (SELECT doc_id,
        |  ('0x' || substr(md5(cast(doc_id AS VARCHAR) || '|split'), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin),

    // -- GROUP-level holdout: split keyed on `source` instead of doc_id,
    //    so every document of a source lands in the SAME split — the
    //    leakage-free eval discipline when documents within a source are
    //    correlated (near-dups, shared boilerplate). The aggregate proves
    //    both the assignment and the invariant: n_splits_per_source = 1
    //    for every source, recomputed relationally by the oracle ----------
    ("q_group_split",
      (s: SparkSession, d: String) =>
        graft.ops.Export.hashSplit(
            t(s, d, "documents").select("doc_id", "source"), "source", "grp")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("split")).as("n_splits"),
            min(col("split")).as("split"))
          .orderBy("source"),
      """WITH b AS (SELECT doc_id, source,
        |  ('0x' || substr(md5(source || '|grp'), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents),
        |sp AS (SELECT doc_id, source,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM b)
        |SELECT source, count(*) AS n_docs,
        |  count(DISTINCT split) AS n_splits, min(split) AS split
        |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- seeded global shuffle as a distributed sort: training order =
    //    ORDER BY md5(doc_id | seed). No RNG state, retry-stable, and the
    //    top-k here plans as TakeOrderedAndProject (no full result pull) --
    ("q_shuffle_order",
      (s: SparkSession, d: String) =>
        t(s, d, "documents")
          .select(col("doc_id"),
            graft.ops.Export.shuffleKey(col("doc_id"), 7L).as("ord"))
          .orderBy("ord", "doc_id")
          .limit(100),
      """SELECT doc_id, md5(cast(doc_id AS VARCHAR) || '|shuffle7') AS ord
        |FROM documents ORDER BY ord, doc_id LIMIT 100""".stripMargin),

    // -- balanced shards: global rank over (n_chars DESC, doc_id), shard =
    //    rank mod 8 — sizes differ by <=1 and big docs spread evenly. The
    //    rank is the two-phase range-partition scheme, NOT a no-partition
    //    window (which would funnel the corpus through one task); DuckDB's
    //    serial row_number() is the semantic twin ------------------------
    ("q_shard_assign",
      (s: SparkSession, d: String) =>
        graft.ops.Export.assignShards(
            t(s, d, "documents").select("doc_id", "n_chars"),
            Seq(col("n_chars").desc, col("doc_id").asc), nShards = 8)
          .select("doc_id", "shard")
          .orderBy("doc_id"),
      """SELECT doc_id,
        |  (row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) % 8 AS shard
        |FROM documents ORDER BY doc_id""".stripMargin))
}
