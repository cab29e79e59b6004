package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Entity resolution (record linkage) under the oracle gate: a noisy-
  * record fixture derived deterministically from the documents table
  * (IDENTICAL SQL in both engines), then [[graft.ops.Entity]]'s
  * PassJoin-blocked edit-distance join, component closure, and
  * survivorship election, each hash-compared against DuckDB.
  *
  * Fixture: each document contributes a 24-char lowercase "name"
  * (cleaned text prefix); every third document also contributes a
  * one-char-DELETED variant and every fifth a one-char-SUBSTITUTED
  * variant, with the edit position derived from md5(name) so both
  * engines compute the same bytes. That yields exact-duplicate names,
  * 1-edit and 2-edit true pairs, and (at sf0.01) 62 cross-document
  * collisions — so the gate exercises matching, transitivity, AND the
  * blocking guarantee: the DuckDB oracle is a BRUTE-FORCE all-pairs
  * levenshtein, so hash equality proves the segment blocking dropped
  * no pair (same proof shape as q_image_neardup's banded join).
  *
  * Names are ASCII by construction ([^a-z ] stripped): Spark's
  * levenshtein counts codepoints, DuckDB's counts bytes, and the two
  * agree exactly on ASCII.
  */
object EntityOps {

  type Fn = (SparkSession, String) => DataFrame

  /** The noisy-record fixture: (rec_id, nm). rec_id = doc_id*4 for the
    * base record, +1 for the deletion variant, +2 for the substitution
    * variant — disjoint by construction.
    */
  private[queries] def records(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "documents")
      .withColumn("nm",
        trim(substring(regexp_replace(lower(col("text")), "[^a-z ]", ""), 1, 24)))
      .filter(length(col("nm")) >= 8)
      .withColumn("h", expr("conv(substr(md5(nm), 1, 6), 16, 10)").cast("long"))
      .select(col("doc_id"), col("nm"), col("h"))
    val baseRec = base.select((col("doc_id") * 4).as("rec_id"), col("nm"))
    val del = base.filter(col("doc_id") % 3 === 0)
      .withColumn("p", lit(2) + col("h") % (length(col("nm")) - 3))
      .select((col("doc_id") * 4 + 1).as("rec_id"),
        concat(expr("substring(nm, 1, p - 1)"), expr("substring(nm, p + 1, 100)")).as("nm"))
    val sub = base.filter(col("doc_id") % 5 === 0)
      .withColumn("p", lit(2) + col("h") % 7)
      .select((col("doc_id") * 4 + 2).as("rec_id"),
        concat(expr("substring(nm, 1, p - 1)"), lit("q"),
          expr("substring(nm, p + 1, 100)")).as("nm"))
    baseRec.union(del).union(sub)
  }

  /** Real file bytes of the fixture's source table — the spread-decision
    * signal Entity.editPairs takes (plan stats underestimate text columns;
    * see the scaladoc there).
    */
  private def srcBytes(s: SparkSession, d: String): Long =
    graft.streaming.StreamTune.pathBytes(s, Seq(s"$d/documents.parquet"))

  /** The fixture as a DuckDB CTE — term-for-term the Spark plan above. */
  private val recordsCte =
    """b AS (
      |  SELECT doc_id, trim(substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, 24)) AS nm
      |  FROM documents),
      |b2 AS (SELECT doc_id, nm, ('0x'||substr(md5(nm),1,6))::BIGINT AS h
      |       FROM b WHERE len(nm) >= 8),
      |recs AS (
      |  SELECT doc_id*4 AS rec_id, nm FROM b2
      |  UNION ALL
      |  SELECT doc_id*4+1, substr(nm,1,p-1) || substr(nm,p+1,100)
      |  FROM (SELECT doc_id, nm, 2 + (h % (len(nm)-3)) AS p FROM b2 WHERE doc_id % 3 = 0)
      |  UNION ALL
      |  SELECT doc_id*4+2, substr(nm,1,p-1) || 'q' || substr(nm,p+1,100)
      |  FROM (SELECT doc_id, nm, 2 + (h % 7) AS p FROM b2 WHERE doc_id % 5 = 0))""".stripMargin

  /** Brute-force edge list + recursive closure, shared by the cluster and
    * survivorship oracles (q_dedup_components' walk pattern).
    */
  private val closureCtes =
    s"""$recordsCte,
       |p AS (SELECT a.rec_id AS a, b.rec_id AS b
       |      FROM recs a JOIN recs b
       |      ON a.rec_id < b.rec_id AND levenshtein(a.nm, b.nm) <= 2),
       |e AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
       |walk(u, v) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM e)
       |  UNION
       |  SELECT w.u, e.v FROM walk w JOIN e ON w.v = e.u),
       |c AS (SELECT u AS rec_id, min(v) AS component FROM walk GROUP BY 1),
       |m AS (SELECT r.rec_id, r.nm, coalesce(c.component, r.rec_id) AS entity_id
       |      FROM recs r LEFT JOIN c ON r.rec_id = c.rec_id)""".stripMargin

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- blocked edit-distance join: PassJoin segments (k+1 per record,
    //    probed at ±k alignment shifts) + levenshtein verify. The oracle
    //    is BRUTE-FORCE all-pairs, so equality proves the blocking
    //    complete, not just the verify correct ---------------------------
    ("q_entity_pairs",
      (s: SparkSession, d: String) =>
        graft.ops.Entity.editPairs(records(s, d), "rec_id", "nm", k = 2,
            inputBytes = srcBytes(s, d))
          .select(col("a"), col("b"), col("dist").cast("long").as("dist"))
          .orderBy("a", "b"),
      s"""WITH $recordsCte,
         |d AS (SELECT a.rec_id AS a, b.rec_id AS b,
         |        levenshtein(a.nm, b.nm) AS dist
         |      FROM recs a JOIN recs b ON a.rec_id < b.rec_id)
         |SELECT a, b, CAST(dist AS BIGINT) AS dist FROM d
         |WHERE dist <= 2 ORDER BY 1, 2""".stripMargin),

    // -- entity assignment: star-contraction components over the verified
    //    pairs; singletons map to themselves. Oracle closes the same
    //    brute-force edge list with a recursive CTE ----------------------
    ("q_entity_clusters",
      (s: SparkSession, d: String) =>
        graft.ops.Entity.resolve(records(s, d), "rec_id", "nm", k = 2,
            inputBytes = srcBytes(s, d))
          .select(col("rec_id"), col("entity_id"))
          .orderBy("rec_id"),
      s"""WITH RECURSIVE $closureCtes
         |SELECT rec_id, entity_id FROM m ORDER BY 1""".stripMargin),

    // -- survivorship: one master row per entity — longest member name,
    //    lexicographic tie-break, member count ---------------------------
    ("q_entity_resolve",
      (s: SparkSession, d: String) => {
        val resolved = graft.ops.Entity.resolve(records(s, d), "rec_id", "nm",
          k = 2, inputBytes = srcBytes(s, d))
        graft.ops.Entity.canonicalize(resolved, "nm")
          .select(col("entity_id"), col("canonical_name"),
            col("n_members").cast("long").as("n_members"))
          .orderBy("entity_id")
      },
      s"""WITH RECURSIVE $closureCtes,
         |a1 AS (SELECT entity_id, count(*) AS n_members, max(len(nm)) AS mx
         |       FROM m GROUP BY 1)
         |SELECT a1.entity_id, min(m.nm) AS canonical_name,
         |  CAST(a1.n_members AS BIGINT) AS n_members
         |FROM m JOIN a1 ON m.entity_id = a1.entity_id AND len(m.nm) = a1.mx
         |GROUP BY a1.entity_id, a1.n_members ORDER BY 1""".stripMargin))
}
