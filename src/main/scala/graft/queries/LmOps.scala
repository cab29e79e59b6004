package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Model-based curation filters under the oracle gate: reference-LM
  * cross-entropy scoring (CCNet) and DSIR hashed importance weights.
  * Library forms and determinism notes in [[graft.ops.LangModel]].
  */
object LmOps {

  type Fn = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- CCNet-style quality score: add-one unigram LM trained on the
    //    lang='en' slice, every doc scored by cross-entropy (nats/token).
    //    Vocab counts broadcast back against per-doc tf; ln rounded to 6
    //    decimals then decimal-summed, so the score is engine-exact ------
    ("q_lm_xent",
      (s: SparkSession, d: String) =>
        graft.ops.LangModel.unigramCrossEntropy(
            t(s, d, "documents"), "doc_id", "text",
            refPred = col("lang") === "en")
          .orderBy("doc_id"),
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word
        |             FROM documents),
        |tf AS (SELECT doc_id, word, cast(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |ref AS (SELECT word, cast(count(*) AS BIGINT) AS wc
        |        FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
        |              FROM documents WHERE lang = 'en') GROUP BY 1),
        |stats AS (SELECT cast(sum(wc) AS BIGINT) AS n_ref,
        |            cast(count(*) AS BIGINT) AS v_ref FROM ref),
        |lp AS (SELECT tf.doc_id, tf.tf,
        |         cast(round(ln(cast(coalesce(ref.wc, 0) + 1 AS DOUBLE) /
        |           cast(n_ref + v_ref + 1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lnp
        |       FROM tf LEFT JOIN ref USING (word) CROSS JOIN stats)
        |SELECT doc_id, cast(sum(tf) AS BIGINT) AS n_tok,
        |  round(cast(-sum(tf * lnp) AS DOUBLE) / sum(tf), 4) AS xent
        |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin),

    // -- DSIR importance weights: unigram+bigram features hashed into
    //    1024 buckets (cross-engine 60-bit md5), per-bucket smoothed
    //    target-vs-raw log-likelihood ratio, per-doc decimal-exact sum.
    //    The model side is two O(buckets) tables that broadcast — nothing
    //    corpus-sized ever shuffles except the (doc, bucket) counts ------
    ("q_dsir_weights",
      (s: SparkSession, d: String) =>
        graft.ops.LangModel.dsirLogWeights(
            t(s, d, "documents"), "doc_id", "text",
            targetPred = col("lang") === "en", buckets = 1024)
          .orderBy("doc_id"),
      """WITH t AS (SELECT doc_id, lang, regexp_extract_all(text, '\S+') AS w
        |           FROM documents),
        |f AS (SELECT doc_id, lang,
        |        unnest(w || [w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS feat
        |      FROM t),
        |b AS (SELECT doc_id, lang,
        |        ('0x' || substr(md5(feat), 1, 15))::BIGINT % 1024 AS bk
        |      FROM f),
        |raw AS (SELECT bk, cast(count(*) AS BIGINT) AS cr FROM b GROUP BY 1),
        |tgt AS (SELECT bk, cast(count(*) AS BIGINT) AS ct
        |        FROM b WHERE lang = 'en' GROUP BY 1),
        |nr AS (SELECT cast(sum(cr) AS BIGINT) AS nr FROM raw),
        |nt AS (SELECT cast(sum(ct) AS BIGINT) AS nt FROM tgt),
        |llr AS (SELECT raw.bk,
        |          cast(round(ln(cast(coalesce(tgt.ct, 0) + 1 AS DOUBLE) /
        |            cast(nt + 1024 AS DOUBLE)), 6) AS DECIMAL(18,6))
        |        - cast(round(ln(cast(raw.cr + 1 AS DOUBLE) /
        |            cast(nr + 1024 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS llr
        |        FROM raw LEFT JOIN tgt USING (bk) CROSS JOIN nr CROSS JOIN nt),
        |db AS (SELECT doc_id, bk, cast(count(*) AS BIGINT) AS nb
        |       FROM b GROUP BY 1, 2)
        |SELECT doc_id, cast(sum(nb) AS BIGINT) AS n_feat,
        |  round(cast(sum(nb * llr) AS DOUBLE), 4) AS logw
        |FROM db JOIN llr USING (bk) GROUP BY 1 ORDER BY doc_id""".stripMargin)
  )
}
