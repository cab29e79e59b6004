package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Exact-substring span dedup (Lee et al. 2021, arXiv:2107.06499) and BM25
  * retrieval — the span-granular half of the dedup story (the doc-granular
  * half lives in TextOps/MoreOps3) plus query-relevance ranking. All
  * entries sit under the DuckDB oracle gate; determinism notes in
  * [[graft.ops.Dedup.duplicateSpans]] and [[graft.ops.Ranking.bm25TopK]].
  */
object SpanOps {

  type Fn = (SparkSession, String) => DataFrame

  /** Shared DuckDB CTE chain: positioned 5-grams → grams in >= 2 docs →
    * gaps-and-islands merge into maximal spans of >= 8 tokens. Mirrors
    * Dedup.duplicateSpans(k=5, minDocs=2, minSpanTokens=8) stage by stage.
    */
  private val spanCte =
    """WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
      |g AS (SELECT doc_id, p, array_to_string(w[p:p+4], ' ') AS gram
      |      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 5 + 2)) AS p
      |            FROM t WHERE len(w) >= 5)),
      |dup AS (SELECT gram FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
      |dp AS (SELECT g.doc_id, g.p FROM g JOIN dup USING (gram)),
      |brk AS (SELECT doc_id, p,
      |          CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 5
      |               THEN 0 ELSE 1 END AS b
      |        FROM dp),
      |isl AS (SELECT doc_id, p,
      |          sum(b) OVER (PARTITION BY doc_id ORDER BY p) AS island
      |        FROM brk),
      |spans AS (SELECT doc_id, cast(min(p) AS BIGINT) AS span_start,
      |            cast(max(p) + 5 - min(p) AS BIGINT) AS span_tokens
      |          FROM isl GROUP BY doc_id, island
      |          HAVING max(p) + 5 - min(p) >= 8)""".stripMargin

  /** Robust-winnowing span detection, relationally (the q_dup_spans_xdoc
    * oracle): positioned 20-char md5 grams → window-min + rightmost-argmin
    * selection → cross-doc fingerprint matches → per-(pair, diagonal)
    * gaps-and-islands spans. Shared verbatim by the detect and apply
    * gates, so the apply oracle removes EXACTLY the spans the detect gate
    * verified.
    */
  private val xdocCte =
      """WITH g AS (
        |  SELECT doc_id, i,
        |    ('0x'||substr(md5(substr(text, cast(i AS BIGINT), 20)),1,15))::BIGINT AS h
        |  FROM (SELECT doc_id, text, unnest(range(1, len(text)-20+2)) AS i
        |        FROM documents WHERE len(text) >= 20)),
        |wm AS (
        |  SELECT doc_id, i,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS f,
        |    count(*) OVER (PARTITION BY doc_id) AS nh
        |  FROM g),
        |sel AS (
        |  SELECT wm.doc_id, wm.i AS wi, wm.f, max(g2.i) AS pos
        |  FROM wm JOIN g g2 ON g2.doc_id = wm.doc_id
        |    AND g2.i >= wm.i AND g2.i <= wm.i + 7 AND g2.h = wm.f
        |  WHERE wm.i <= greatest(wm.nh - 8 + 1, 1)
        |  GROUP BY 1, 2, 3),
        |occ AS (SELECT DISTINCT doc_id, pos, f FROM sel),
        |m AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |    x.pos AS pa, y.pos AS pb, y.pos - x.pos AS diag
        |  FROM occ x JOIN occ y ON x.f = y.f AND x.doc_id < y.doc_id),
        |brk AS (SELECT a, b, diag, pa, pb,
        |          CASE WHEN pa - lag(pa) OVER (PARTITION BY a, b, diag
        |            ORDER BY pa) <= 27 THEN 0 ELSE 1 END AS bk
        |        FROM m),
        |isl AS (SELECT a, b, diag, pa, pb,
        |          sum(bk) OVER (PARTITION BY a, b, diag ORDER BY pa) AS island
        |        FROM brk),
        |spans AS MATERIALIZED (SELECT a, b,
        |            cast(min(pa) AS BIGINT) AS a_start,
        |            cast(min(pb) AS BIGINT) AS b_start,
        |            cast(count(*) AS BIGINT) AS n_fp,
        |            cast(max(pa) + 20 - min(pa) AS BIGINT) AS span_chars
        |          FROM isl GROUP BY a, b, diag, island
        |          HAVING max(pa) + 20 - min(pa) >= 27)""".stripMargin

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- exact-substring duplicate spans: maximal token runs whose 5-grams
    //    recur in >= 2 documents — removes verbatim boilerplate/quotation
    //    overlap that doc-level near-dup keeps. Linear in token count: the
    //    shuffle key is the gram (d rows per gram, never d² pairs), the
    //    island merge a doc-partitioned window ----------------------------
    ("q_dup_spans",
      (s: SparkSession, d: String) =>
        graft.ops.Dedup.duplicateSpans(
            t(s, d, "documents"), "doc_id", "text",
            k = 5, minDocs = 2, minSpanTokens = 8)
          .orderBy("doc_id", "span_start"),
      spanCte +
        "\nSELECT doc_id, span_start, span_tokens FROM spans ORDER BY doc_id, span_start"),

    // -- CROSS-DOC span-level substring dedup (Dedup.crossDocSpans):
    //    winnowing fingerprints WITH positions (k=20, w=8, md5 gram hash),
    //    candidates from fingerprint buckets (never all-pairs), matches
    //    merged per (pair, diagonal) into maximal spans >= 27 chars — the
    //    Pile recipe at fingerprint granularity, reporting WHERE two docs
    //    share verbatim text. The oracle recomputes robust winnowing
    //    relationally: window-min + rightmost-argmin join, then the same
    //    diagonal gaps-and-islands ------------------------------------------
    ("q_dup_spans_xdoc",
      (s: SparkSession, d: String) =>
        graft.ops.Dedup.crossDocSpans(
            t(s, d, "documents").select(col("doc_id"), col("text")),
            "doc_id", "text", k = 20, w = 8, md5Mode = true)
          .orderBy("a", "b", "a_start", "b_start"),
      xdocCte +
        "\nSELECT a, b, a_start, b_start, n_fp, span_chars" +
        "\nFROM spans ORDER BY a, b, a_start, b_start"),

    // -- the APPLY half (Lee et al. recipe step 2): every detected span is
    //    cut from the HIGHER-id doc (keep-first — one copy survives),
    //    per-doc intervals merged, and the surviving text REBUILT. The two
    //    engines rebuild it by different constructions (Spark: cursor fold
    //    over sorted intervals; DuckDB: complement-segment string_agg), so
    //    the md5 column cross-checks the strings character-for-character,
    //    with surviving token counts alongside ---------------------------
    ("q_dup_spans_apply",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val spans = graft.ops.Dedup.crossDocSpans(
          docs, "doc_id", "text", k = 20, w = 8, md5Mode = true)
        graft.ops.Dedup.crossDocApply(docs, "doc_id", "text", spans)
          .orderBy("doc_id")
      },
      xdocCte + """,
        |iv AS (SELECT b AS doc_id, b_start AS s,
        |         b_start + span_chars - 1 AS e FROM spans),
        |r AS (SELECT doc_id, s, e,
        |        max(e) OVER (PARTITION BY doc_id ORDER BY s
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |      FROM iv),
        |i2 AS (SELECT doc_id, s, e,
        |         sum(CASE WHEN pm IS NOT NULL AND s <= pm + 1
        |             THEN 0 ELSE 1 END)
        |           OVER (PARTITION BY doc_id ORDER BY s) AS g2
        |       FROM r),
        |mg AS MATERIALIZED (SELECT doc_id, min(s) AS ms, max(e) AS me
        |      FROM i2 GROUP BY doc_id, g2),
        |summary AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_spans,
        |              cast(sum(me - ms + 1) AS BIGINT) AS dup_chars
        |            FROM mg GROUP BY 1),
        |segs AS (
        |  SELECT doc_id,
        |    coalesce(lag(me) OVER (PARTITION BY doc_id ORDER BY ms), 0) + 1 AS ss,
        |    ms - 1 AS se
        |  FROM mg
        |  UNION ALL
        |  SELECT mg.doc_id, max(mg.me) + 1 AS ss, max(len(d.text)) AS se
        |  FROM mg JOIN documents d USING (doc_id) GROUP BY mg.doc_id),
        |kept AS (SELECT segs.doc_id,
        |           string_agg(substr(d.text, cast(ss AS BIGINT),
        |             cast(se - ss + 1 AS BIGINT)), '' ORDER BY ss) AS kt
        |         FROM segs JOIN documents d USING (doc_id)
        |         WHERE se >= ss GROUP BY 1)
        |SELECT s.doc_id, s.n_spans, s.dup_chars,
        |  cast(len(coalesce(k.kt, '')) AS BIGINT) AS kept_chars,
        |  cast(len(regexp_extract_all(coalesce(k.kt, ''), '\S+')) AS BIGINT)
        |    AS kept_tokens,
        |  ('0x'||substr(md5(coalesce(k.kt, '')),1,15))::BIGINT AS kept_md5i
        |FROM summary s LEFT JOIN kept k USING (doc_id)
        |ORDER BY doc_id""".stripMargin),
    // -- the apply side: per-doc removal stats. Islands are disjoint by
    //    construction, so summed span_tokens = tokens a span-removal pass
    //    would drop; keep_ratio is what survives ---------------------------
    ("q_dup_span_stats",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val nt = docs.select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
            .cast("long").as("n_tok"))
        val dup = graft.ops.Dedup.duplicateSpans(docs, "doc_id", "text",
            k = 5, minDocs = 2, minSpanTokens = 8)
          .groupBy("doc_id").agg(sum(col("span_tokens")).as("dup_tok"))
        nt.join(dup, "doc_id")
          .select(col("doc_id"), col("n_tok"), col("dup_tok"),
            round(lit(1) - col("dup_tok") / col("n_tok"), 4).as("keep_ratio"))
          .orderBy("doc_id")
      },
      spanCte +
        """
          |, agg AS (SELECT doc_id, cast(sum(span_tokens) AS BIGINT) AS dup_tok
          |          FROM spans GROUP BY 1)
          |SELECT t.doc_id, cast(len(t.w) AS BIGINT) AS n_tok, agg.dup_tok,
          |  round(1 - agg.dup_tok / len(t.w), 4) AS keep_ratio
          |FROM t JOIN agg USING (doc_id) ORDER BY t.doc_id""".stripMargin),

    // -- BM25 top-20 for a 3-term query: tf explode filtered to the terms
    //    at the scan, idf/avgdl from one count-shaped aggregate, per-term
    //    contributions decimal-summed for order independence ---------------
    ("q_bm25",
      (s: SparkSession, d: String) =>
        graft.ops.Ranking.bm25TopK(t(s, d, "documents"), "doc_id", "text",
          terms = Seq("spark", "join", "merge"), k1 = 1.2, b = 0.75, topK = 20),
      """WITH dl AS (SELECT doc_id,
        |        cast(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS dl
        |      FROM documents),
        |stats AS (SELECT cast(count(*) AS BIGINT) AS n_docs,
        |            cast(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word
        |        FROM documents),
        |tf AS (SELECT doc_id, word, cast(count(*) AS BIGINT) AS tf FROM tok
        |       WHERE word IN ('spark', 'join', 'merge') GROUP BY 1, 2),
        |dfw AS (SELECT word, cast(count(DISTINCT doc_id) AS BIGINT) AS df
        |        FROM tf GROUP BY 1),
        |idf AS (SELECT word,
        |          round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)), 6) AS idf
        |        FROM dfw CROSS JOIN stats),
        |c AS (SELECT tf.doc_id,
        |        cast(round(idf.idf * tf.tf * (1.2 + 1) /
        |          (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)), 6)
        |          AS DECIMAL(18,6)) AS contrib
        |      FROM tf JOIN idf USING (word) JOIN dl USING (doc_id) CROSS JOIN stats)
        |SELECT doc_id, round(cast(sum(contrib) AS DOUBLE), 4) AS bm25
        |FROM c GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin)
  )
}
