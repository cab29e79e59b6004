package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Keyed reconciliation queries over [[graft.ops.Diff]] — "what did the
  * re-crawl change": a synthetic v2 of the documents table (dropped,
  * perturbed, and new keys, everything else byte-identical) diffed against
  * v1, classified per key, aggregated per class. The oracle derives the
  * classes INDEPENDENTLY from the construction arithmetic — if the hash
  * canonicalization misclassified even one untouched key as changed (or
  * missed one perturbed key), the counts cannot match.
  */
object DiffOps {

  type Fn = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- re-crawl audit: v2 drops doc_id%13, bumps n_chars on %7, adds
    //    %11 under new ids; Diff.keyed classifies, the aggregate reports.
    //    One shuffle per side on doc_id, join reuses both partitionings;
    //    unchanged keys (the overwhelming mass at scale) never leave the
    //    join ------------------------------------------------------------
    ("q_table_diff",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val vals = Seq("text", "lang", "source", "n_chars")
        val v2 = docs.filter(pmod(col("doc_id"), lit(13)) =!= 0)
          .withColumn("n_chars",
            when(pmod(col("doc_id"), lit(7)) === 0, col("n_chars") + 1L)
              .otherwise(col("n_chars")))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(11)) === 0)
            // negated ids can never collide with a real doc_id (>= 0 by
            // construction at every SF) — a +offset could, at 100x
            .withColumn("doc_id", -(col("doc_id") + 1L)))
        graft.ops.Diff.keyed(docs, v2, Seq("doc_id"), vals)
          .groupBy("change_type")
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"))
          .orderBy("change_type")
      },
      """WITH cls AS (
        |  SELECT doc_id, 'removed' AS change_type FROM documents WHERE doc_id % 13 = 0
        |  UNION ALL
        |  SELECT doc_id, 'changed' FROM documents WHERE doc_id % 7 = 0 AND doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT -(doc_id + 1), 'added' FROM documents WHERE doc_id % 11 = 0)
        |SELECT change_type, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
