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

    // -- per-source perplexity drift: the q_lm_xent score aggregated per
    //    source over two snapshots (even/odd doc_id halves standing in
    //    for release N / N+1), with the mean xent of each side from
    //    DECIMAL sums of the dec4 per-doc scores (order-free) and the
    //    delta — the "which source's text is drifting off-model" monitor
    //    a reference-LM pipeline tracks release over release. One extra
    //    source join + one sources-sized agg on top of the shared scorer -
    ("q_xent_drift",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val scored = graft.ops.LangModel.unigramCrossEntropy(
          docs, "doc_id", "text", refPred = col("lang") === "en")
        val dec = org.apache.spark.sql.types.DecimalType(18, 6)
        val j = scored.join(docs.select(col("doc_id"), col("source")), "doc_id")
          .withColumn("is_ref", pmod(col("doc_id"), lit(2)) === 0)
        j.groupBy("source").agg(
            sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref_docs"),
            sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur_docs"),
            round(sum(when(col("is_ref"), col("xent").cast(dec))).cast("double") /
              sum(when(col("is_ref"), 1L)), 4).as("xent_ref"),
            round(sum(when(!col("is_ref"), col("xent").cast(dec))).cast("double") /
              sum(when(!col("is_ref"), 1L)), 4).as("xent_cur"))
          .select(col("source"), col("n_ref_docs"), col("n_cur_docs"),
            col("xent_ref"), col("xent_cur"),
            round(col("xent_cur") - col("xent_ref"), 4).as("delta"))
          .orderBy("source")
      },
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
        |       FROM tf LEFT JOIN ref USING (word) CROSS JOIN stats),
        |x AS (SELECT doc_id,
        |        round(cast(-sum(tf * lnp) AS DOUBLE) / sum(tf), 4) AS xent
        |      FROM lp GROUP BY 1),
        |jj AS (SELECT x.doc_id, dd.source, x.doc_id % 2 = 0 AS is_ref, xent
        |       FROM x JOIN documents dd ON x.doc_id = dd.doc_id),
        |agg AS (SELECT source,
        |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref_docs,
        |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_cur_docs,
        |    round(cast(sum(CASE WHEN is_ref THEN cast(xent AS DECIMAL(18,6)) END) AS DOUBLE)
        |      / sum(CASE WHEN is_ref THEN 1 END), 4) AS xent_ref,
        |    round(cast(sum(CASE WHEN NOT is_ref THEN cast(xent AS DECIMAL(18,6)) END) AS DOUBLE)
        |      / sum(CASE WHEN NOT is_ref THEN 1 END), 4) AS xent_cur
        |  FROM jj GROUP BY 1)
        |SELECT source, n_ref_docs, n_cur_docs, xent_ref, xent_cur,
        |  round(xent_cur - xent_ref, 4) AS delta
        |FROM agg ORDER BY source""".stripMargin),

    // -- INTERPOLATED BIGRAM cross-entropy (λ = 1/2 Jelinek–Mercer over
    //    add-one bigram + unigram): one modeling step toward CCNet's
    //    KenLM n-gram while staying exactly replayable — position 1
    //    scores by the unigram, later positions by the mixed bigram.
    //    The oracle carries bigrams as 'prev cur' strings (tokens are
    //    \S+ so the space split is unambiguous — the q_dsir convention);
    //    model tables broadcast, per-doc pair counts shuffle once -------
    ("q_lm_xent_bigram",
      (s: SparkSession, d: String) =>
        graft.ops.LangModel.bigramCrossEntropy(
            t(s, d, "documents"), "doc_id", "text",
            refPred = col("lang") === "en")
          .orderBy("doc_id"),
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w
        |             FROM documents),
        |f AS (SELECT doc_id, w[1] AS cur FROM tok WHERE len(w) >= 1),
        |bg AS (SELECT doc_id,
        |         unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS b
        |       FROM tok),
        |bp AS (SELECT doc_id, split_part(b, ' ', 1) AS prev,
        |         split_part(b, ' ', 2) AS cur,
        |         CAST(count(*) AS BIGINT) AS cnt
        |       FROM bg GROUP BY 1, 2, 3),
        |ref AS (SELECT word, cast(count(*) AS BIGINT) AS wc
        |        FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
        |              FROM documents WHERE lang = 'en') GROUP BY 1),
        |stats AS (SELECT cast(sum(wc) AS BIGINT) AS n_ref,
        |            cast(count(*) AS BIGINT) AS v_ref FROM ref),
        |rb AS (SELECT split_part(b, ' ', 1) AS prev,
        |         split_part(b, ' ', 2) AS cur,
        |         cast(count(*) AS BIGINT) AS bc
        |       FROM bg JOIN documents USING (doc_id)
        |       WHERE lang = 'en' GROUP BY 1, 2),
        |rc AS (SELECT prev, cast(sum(bc) AS BIGINT) AS pc FROM rb GROUP BY 1),
        |lf AS (SELECT f.doc_id, CAST(1 AS BIGINT) AS cnt,
        |         cast(round(ln(cast(coalesce(wc, 0) + 1 AS DOUBLE) /
        |           cast(n_ref + v_ref + 1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lnp
        |       FROM f LEFT JOIN ref ON f.cur = ref.word CROSS JOIN stats),
        |lb AS (SELECT bp.doc_id, bp.cnt,
        |         cast(round(ln((
        |             cast(coalesce(bc, 0) + 1 AS DOUBLE) /
        |               cast(coalesce(pc, 0) + v_ref + 1 AS DOUBLE)
        |           + cast(coalesce(wc, 0) + 1 AS DOUBLE) /
        |               cast(n_ref + v_ref + 1 AS DOUBLE)) / 2.0), 6)
        |           AS DECIMAL(18,6)) AS lnp
        |       FROM bp LEFT JOIN rb USING (prev, cur)
        |       LEFT JOIN rc USING (prev)
        |       LEFT JOIN ref ON bp.cur = ref.word CROSS JOIN stats),
        |allt AS (SELECT doc_id, cnt, lnp FROM lf
        |         UNION ALL SELECT doc_id, cnt, lnp FROM lb)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok,
        |  round(cast(-sum(cnt * lnp) AS DOUBLE) / sum(cnt), 4) AS xent
        |FROM allt GROUP BY 1 ORDER BY doc_id""".stripMargin),

    // -- PER-SOURCE SEASONAL XENT: q_xent_drift's monitor crossed with
    //    q_seasonal_dow's weekday split — per (source, crawl-day-of-week)
    //    mean reference-LM cross-entropy plus each weekday's deviation
    //    from its source's overall mean (the "is Saturday's crawl slice
    //    systematically off-model for this source" signal). doc_id % 7
    //    stands in for the crawl weekday exactly as q_xent_drift's
    //    doc_id % 2 stands in for release halves. Shape: the shared
    //    scorer + one sources×7-sized agg; the per-source mean is
    //    re-derived from the SAME dec6 sums, so the deviation is exact --
    ("q_xent_seasonal",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val scored = graft.ops.LangModel.unigramCrossEntropy(
          docs, "doc_id", "text", refPred = col("lang") === "en")
        val dec = org.apache.spark.sql.types.DecimalType(18, 6)
        val j = scored.join(docs.select(col("doc_id"), col("source")), "doc_id")
          .withColumn("dow", pmod(col("doc_id"), lit(7L)))
        val byDow = j.groupBy("source", "dow").agg(
          count(lit(1)).as("n_docs"),
          sum(col("xent").cast(dec)).as("xsum"))
        val bySrc = byDow.groupBy("source").agg(
          (sum(col("xsum")).cast("double") / sum(col("n_docs"))).as("src_raw"))
        byDow.join(broadcast(bySrc), Seq("source"))
          .select(col("source"), col("dow"), col("n_docs"),
            round(col("xsum").cast("double") / col("n_docs"), 4).as("xent_dow"),
            round(col("src_raw"), 4).as("xent_src"),
            // + 0.0 folds IEEE -0.0 to +0.0 (a dev of -0.00004 rounds to
            // the SIGNED zero; the gate's canonical row sort is stringly)
            (round(col("xsum").cast("double") / col("n_docs") - col("src_raw"), 4)
              + lit(0.0)).as("dev"))
          .orderBy("source", "dow")
      },
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
        |       FROM tf LEFT JOIN ref USING (word) CROSS JOIN stats),
        |x AS (SELECT doc_id,
        |        round(cast(-sum(tf * lnp) AS DOUBLE) / sum(tf), 4) AS xent
        |      FROM lp GROUP BY 1),
        |jj AS (SELECT x.doc_id, dd.source, x.doc_id % 7 AS dow, xent
        |       FROM x JOIN documents dd ON x.doc_id = dd.doc_id),
        |bd AS (SELECT source, dow, cast(count(*) AS BIGINT) AS n_docs,
        |         sum(cast(xent AS DECIMAL(18,6))) AS xsum
        |       FROM jj GROUP BY 1, 2),
        |bs AS (SELECT source,
        |         cast(sum(xsum) AS DOUBLE) / sum(n_docs) AS src_raw
        |       FROM bd GROUP BY 1)
        |SELECT source, dow, n_docs,
        |  round(cast(xsum AS DOUBLE) / n_docs, 4) AS xent_dow,
        |  round(src_raw, 4) AS xent_src,
        |  round(cast(xsum AS DOUBLE) / n_docs - src_raw, 4) + 0.0 AS dev
        |FROM bd JOIN bs USING (source) ORDER BY source, dow""".stripMargin),

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
        |FROM db JOIN llr USING (bk) GROUP BY 1 ORDER BY doc_id""".stripMargin),

    // -- TRAINED document classifier under the gate: multinomial Naive
    //    Bayes language ID — model trained on the even-doc_id half
    //    (per-(lang, bucket) counts + priors, every ln dec6-rounded,
    //    scores exact decimal sums), the odd half classified by argmax
    //    (ties to smallest label, decided on exact decimals via min_by —
    //    no per-document sort), reported as the CONFUSION MATRIX. The
    //    fixture's lang column is uncorrelated with its (English-ish)
    //    text, so 2/3 of docs get a deterministic class marker token
    //    appended on BOTH sides (the q_script_mix convention) — the
    //    gated matrix then shows the model LEARNING (marked docs on the
    //    diagonal) and falling back to the majority prior (unmarked
    //    docs), not just two engines agreeing on a constant. DuckDB
    //    retrains and reclassifies identically, so the hash compare
    //    grades model, inference and evaluation at once ------------------
    ("q_nb_classify",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
          .withColumn("text", when(pmod(col("doc_id"), lit(3)) =!= 0,
            concat(col("text"),
              repeat(concat(lit(" xmark_"), col("lang")), 8)))
            .otherwise(col("text")))
        val train = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        val test = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        graft.ops.NaiveBayes
          .classify(train, test, "doc_id", "text", "lang", buckets = 1024)
          .join(test.select(col("doc_id"), col("lang")), "doc_id")
          .groupBy(col("lang"), col("pred"))
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "pred")
      },
      """WITH d0 AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 3 <> 0 THEN text || repeat(' xmark_' || lang, 8)
        |         ELSE text END AS text
        |  FROM documents),
        |train AS (SELECT lang, text FROM d0 WHERE doc_id % 2 = 0),
        |cls AS (SELECT lang AS cls, count(*) AS n_docs FROM train GROUP BY 1),
        |tot AS (SELECT cast(sum(n_docs) AS BIGINT) AS n_all FROM cls),
        |pri AS (SELECT cls, cast(round(ln(cast(n_docs AS DOUBLE) / n_all), 6) AS DECIMAL(18,6)) AS lnprior
        |        FROM cls, tot),
        |cnt AS (SELECT cls, bk, count(*) AS c FROM (
        |          SELECT lang AS cls, ('0x'||substr(md5(w),1,15))::BIGINT % 1024 AS bk
        |          FROM (SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS w FROM train))
        |        GROUP BY 1, 2),
        |ntk AS (SELECT cls, cast(sum(c) AS BIGINT) AS n_tok FROM cnt GROUP BY 1),
        |feats AS (SELECT doc_id, lang, bk, cast(count(*) AS BIGINT) AS nb FROM (
        |            SELECT doc_id, lang, ('0x'||substr(md5(w),1,15))::BIGINT % 1024 AS bk
        |            FROM (SELECT doc_id, lang, unnest(regexp_extract_all(text, '\S+')) AS w
        |                  FROM d0 WHERE doc_id % 2 = 1))
        |          GROUP BY 1, 2, 3),
        |sc AS (SELECT f.doc_id, f.lang, p.cls, p.lnprior +
        |         sum(f.nb * cast(round(ln(cast(coalesce(c.c, 0) + 1 AS DOUBLE) /
        |           (n.n_tok + 1024)), 6) AS DECIMAL(18,6))) AS score
        |       FROM feats f CROSS JOIN pri p JOIN ntk n ON n.cls = p.cls
        |       LEFT JOIN cnt c ON c.cls = p.cls AND c.bk = f.bk
        |       GROUP BY 1, 2, 3, p.lnprior),
        |pred AS (SELECT doc_id, lang, cls AS pred,
        |           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rk
        |         FROM sc)
        |SELECT lang, pred, count(*) AS n FROM pred WHERE rk = 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // -- the hashing trick: every document as a fixed-256-dim signed
    //    sparse count vector in long form (doc_id, dim, v), no vocabulary
    //    anywhere — dim and sign come from disjoint md5 substrings, so
    //    DuckDB reproduces the vectors bit-for-bit. The shuffle keys on
    //    (doc, dim) and the dimension table never exists: the featurizer
    //    whose memory footprint is independent of corpus vocabulary ------
    ("q_feature_hash",
      (s: SparkSession, d: String) =>
        graft.ops.LangModel.hashingVectorize(
            t(s, d, "documents").filter(col("doc_id") < 40),
            "doc_id", "text", dims = 256)
          .orderBy("doc_id", "dim"),
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
        |             FROM documents WHERE doc_id < 40),
        |sgn AS (SELECT doc_id,
        |    ('0x' || substr(md5(w), 1, 15))::BIGINT % 256 AS dim,
        |    CASE WHEN ('0x' || substr(md5(w), 16, 1))::BIGINT % 2 = 0
        |         THEN 1 ELSE -1 END AS sign
        |  FROM tok)
        |SELECT doc_id, dim, CAST(sum(sign) AS BIGINT) AS v
        |FROM sgn GROUP BY 1, 2 HAVING sum(sign) <> 0
        |ORDER BY doc_id, dim""".stripMargin)
  )
}
