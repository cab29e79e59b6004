package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Corpus-cleaning operators: PII redaction and C4-style line-level
  * boilerplate filtering — the scrub passes a training-data pipeline runs
  * before dedup/packing. Both are map-only scans of codegen'd built-ins
  * (regex + higher-order array functions, no UDFs), so at 100 TB they
  * parallelize per input split and shuffle only the final small stats.
  *
  * The synthetic `documents` text contains no real PII, so q_pii_redact
  * first injects deterministic PII strings derived from doc_id — both
  * engines build the identical enriched text, then the Spark side must
  * detect and redact exactly what the oracle does.
  */
object CleanOps {

  type Fn = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- Bloom-prefiltered exact decontamination (ops/Bloom + the native
    //    BloomMightContain predicate): benchmark fingerprints become a
    //    broadcast Bloom sketch; corpus rows the sketch rules out skip the
    //    anti-join shuffle entirely, the maybe-fraction confirms exactly.
    //    Result == plain anti-join (no false negatives; false positives
    //    removed by the confirm), so the oracle is the exact NOT IN --------
    ("q_decontaminate_bloom",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val bench = docs.filter(col("doc_id") < 50).select(md5(col("text")).as("fp"))
        val corpus = docs.filter(col("doc_id") >= 50)
          .select(col("lang"), md5(col("text")).as("fp"))
        graft.ops.Bloom.bloomAntiJoin(corpus, bench, "fp")
          .groupBy("lang").agg(count(lit(1)).as("kept"))
          .orderBy("lang")
      },
      """WITH bench AS (SELECT md5(text) AS fp FROM documents WHERE doc_id < 50),
        |corpus AS (SELECT lang, md5(text) AS fp FROM documents WHERE doc_id >= 50)
        |SELECT lang, count(*) AS kept FROM corpus
        |WHERE fp NOT IN (SELECT fp FROM bench)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- PII detection + redaction (ops/Privacy): inject deterministic
    //    emails/phones/IPs keyed off doc_id, count matches per class, and
    //    measure chars removed by the placeholder rewrite. Patterns stay in
    //    the Java∩RE2 regex subset so both engines see identical matches ----
    ("q_pii_redact",
      (s: SparkSession, d: String) => {
        val id = col("doc_id")
        val enriched = concat(col("text"),
          when(id % 3 === 0, concat(lit(" contact u"), id.cast("string"),
            lit("@ex"), (id % 10).cast("string"), lit(".com"))).otherwise(lit("")),
          when(id % 7 === 3, concat(lit(" call 555-"),
            lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
          when(id % 9 === 5, concat(lit(" host 10."), (id % 256).cast("string"),
            lit(".0."), (id % 100).cast("string"))).otherwise(lit("")))
        val base = t(s, d, "documents")
          .select(col("source"), col("doc_id"), enriched.as("t0"))
        graft.ops.Privacy.detect(base, "t0")
          .withColumn("t1", graft.ops.Privacy.redactExpr(col("t0")))
          .groupBy("source")
          .agg(
            sum(when(col("n_emails") + col("n_phones") + col("n_ips") > 0, 1L)
              .otherwise(0L)).as("n_docs_flagged"),
            sum(col("n_emails")).as("emails"),
            sum(col("n_phones")).as("phones"),
            sum(col("n_ips")).as("ips"),
            sum((length(col("t0")) - length(col("t1"))).cast("long"))
              .as("chars_removed"))
          .orderBy("source")
      },
      """WITH e AS (
        |  SELECT source, doc_id,
        |    text ||
        |    (CASE WHEN doc_id % 3 = 0 THEN ' contact u' || doc_id || '@ex' ||
        |       (doc_id % 10) || '.com' ELSE '' END) ||
        |    (CASE WHEN doc_id % 7 = 3 THEN ' call 555-' ||
        |       lpad(cast(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END) ||
        |    (CASE WHEN doc_id % 9 = 5 THEN ' host 10.' || (doc_id % 256) ||
        |       '.0.' || (doc_id % 100) ELSE '' END) AS t0
        |  FROM documents),
        |c AS (
        |  SELECT source,
        |    cast(len(regexp_extract_all(t0,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |    cast(len(regexp_extract_all(t0, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        |    cast(len(regexp_extract_all(t0,
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |    cast(len(t0) - len(regexp_replace(regexp_replace(regexp_replace(t0,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
        |      '\b\d{3}-\d{4}\b', '[PHONE]', 'g')) AS BIGINT) AS removed
        |  FROM e)
        |SELECT source,
        |  cast(sum(CASE WHEN n_emails + n_phones + n_ips > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_docs_flagged,
        |  cast(sum(n_emails) AS BIGINT) AS emails,
        |  cast(sum(n_phones) AS BIGINT) AS phones,
        |  cast(sum(n_ips) AS BIGINT) AS ips,
        |  cast(sum(removed) AS BIGINT) AS chars_removed
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- C4-style line-level boilerplate filter: tokenize once (materialized
    //    column — HOF lambdas re-evaluate inlined expressions per element),
    //    reshape into 8-word "lines", keep lines containing a stopword
    //    ('the'/'a' — the stopword-presence rule; real C4 also wants
    //    terminal punctuation, absent from this corpus), reassemble, and
    //    report per-source retention. transform/filter/exists/flatten are
    //    all codegen-adjacent array built-ins — map-only until the final
    //    stats shuffle --------------------------------------------------
    ("q_line_filter",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
          .select(col("source"), col("doc_id"),
            regexp_extract_all(col("text"), lit("\\S+"), lit(0)).as("w"))
          .withColumn("nl", expr("size(w) div 8").cast("int"))
          .filter(col("nl") >= 1)
          .withColumn("lines", transform(sequence(lit(0), col("nl") - 1),
            i => slice(col("w"), i * 8 + 1, lit(8))))
          .withColumn("kept", filter(col("lines"),
            l => exists(l, wd => wd.isin("the", "a"))))
        docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nl").cast("long")).as("n_lines"),
            sum(size(col("kept")).cast("long")).as("n_kept"),
            sum(length(array_join(flatten(col("kept")), " ")).cast("long"))
              .as("kept_chars"))
          .orderBy("source")
      },
      """WITH t AS (SELECT source, doc_id,
        |             regexp_extract_all(text, '\S+') AS w FROM documents),
        |d AS (SELECT source, doc_id, len(w) // 8 AS nl,
        |        [w[i*8+1 : i*8+8] for i in range(0, len(w) // 8)] AS lines
        |      FROM t WHERE len(w) >= 8),
        |k AS (SELECT source, nl,
        |        list_filter(lines,
        |          l -> len(list_filter(l, x -> x IN ('the', 'a'))) > 0) AS kept
        |      FROM d)
        |SELECT source, count(*) AS n_docs, cast(sum(nl) AS BIGINT) AS n_lines,
        |  cast(sum(len(kept)) AS BIGINT) AS n_kept,
        |  cast(sum(len(array_to_string(flatten(kept), ' '))) AS BIGINT) AS kept_chars
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- C4-style corpus-wide line DEDUP (ops/Dedup.lineDedup): a
    //    duplicated 8-word line survives only at its first corpus
    //    occurrence — min (doc_id, pos) — and each document is reassembled
    //    from its surviving lines. The dedup key is the LINE TEXT itself
    //    (collision-exact); the rebuilt text is md5-compared so the whole
    //    reassembly is under the hash gate without shipping full text into
    //    the result. Oracle = the same first-occurrence rule via a
    //    row_number window --------------------------------------------------
    ("q_line_dedup",
      (s: SparkSession, d: String) =>
        graft.ops.Dedup.lineDedup(t(s, d, "documents"), "doc_id", "text", 8)
          .select(col("doc_id"), col("n_lines"), col("n_kept"),
            md5(col("rebuilt")).as("rebuilt_md5"))
          .orderBy("doc_id"),
      """WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w
        |           FROM documents),
        |d AS (SELECT doc_id, len(w) // 8 AS nl, i - 1 AS pos,
        |        array_to_string(w[(i-1)*8+1 : (i-1)*8+8], ' ') AS line
        |      FROM t, unnest(generate_series(1, len(w) // 8)) AS r(i)),
        |k AS (SELECT doc_id, nl, pos, line,
        |        row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        |      FROM d),
        |kept AS (SELECT doc_id, pos, line FROM k WHERE rn = 1),
        |base AS (SELECT doc_id, max(nl) AS n_lines FROM d GROUP BY 1),
        |reb AS (SELECT doc_id, count(*) AS n_kept,
        |          md5(string_agg(line, ' ' ORDER BY pos)) AS rebuilt_md5
        |        FROM kept GROUP BY 1)
        |SELECT base.doc_id, cast(n_lines AS BIGINT) AS n_lines,
        |  cast(coalesce(n_kept, 0) AS BIGINT) AS n_kept, rebuilt_md5
        |FROM base LEFT JOIN reb USING (doc_id)
        |ORDER BY doc_id""".stripMargin),

    // -- Gopher-style quality rule set: word-count bounds, mean word
    //    length, stopword presence, and single-word-repetition cap, each an
    //    integer-exact multiply-through decision (4n ≤ Σlen ≤ 10n, 5·maxfreq
    //    ≤ n) so no float boundary can differ between engines. One explode +
    //    two doc_id-keyed aggregations — shuffles scale with token count,
    //    no window, no UDF ---------------------------------------------------
    ("q_gopher_rules",
      (s: SparkSession, d: String) => {
        val words = t(s, d, "documents")
          .select(col("doc_id"),
            explode(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
              .as("word"))
        val freq = words.groupBy(col("doc_id"), col("word"))
          .agg(count(lit(1)).as("c"))
        val m = freq.groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n"),
            sum(col("c") * length(col("word")).cast("long")).as("sl"),
            sum(when(col("word").isin("the", "a"), col("c")).otherwise(0L))
              .as("stp"),
            max(col("c")).as("mf"))
        m.select(col("doc_id"), col("n").as("n_words"),
            col("n").between(50L, 100000L).as("r_wordcount"),
            (col("sl") >= col("n") * 4 && col("sl") <= col("n") * 10)
              .as("r_meanlen"),
            (col("stp") >= 2L).as("r_stopwords"),
            (col("mf") * 5 <= col("n")).as("r_repetition"))
          .withColumn("pass",
            col("r_wordcount") && col("r_meanlen") && col("r_stopwords") &&
              col("r_repetition"))
          .orderBy("doc_id")
      },
      """WITH e AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word
        |           FROM documents),
        |f AS (SELECT doc_id, word, count(*) AS c FROM e GROUP BY 1, 2),
        |m AS (SELECT doc_id, sum(c) AS n, sum(c * len(word)) AS sl,
        |        sum(CASE WHEN word IN ('the', 'a') THEN c ELSE 0 END) AS stp,
        |        max(c) AS mf
        |      FROM f GROUP BY 1)
        |SELECT doc_id, cast(n AS BIGINT) AS n_words,
        |  n BETWEEN 50 AND 100000 AS r_wordcount,
        |  sl >= n * 4 AND sl <= n * 10 AS r_meanlen,
        |  stp >= 2 AS r_stopwords,
        |  mf * 5 <= n AS r_repetition,
        |  (n BETWEEN 50 AND 100000) AND (sl >= n * 4 AND sl <= n * 10)
        |    AND stp >= 2 AND mf * 5 <= n AS pass
        |FROM m ORDER BY doc_id""".stripMargin),

    // -- k-anonymity suppression (ops/Privacy.suppressSmallGroups): rows
    //    whose (nationkey, mktsegment) quasi-identifier combination occurs
    //    fewer than k=8 times are re-identifiable and dropped before
    //    "release"; the aggregate over the survivors is the audit. One
    //    partitioned-window count — the same hash exchange a groupBy pays,
    //    no global window ------------------------------------------------
    ("q_k_anonymity",
      (s: SparkSession, d: String) =>
        graft.ops.Privacy.suppressSmallGroups(
            t(s, d, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 8L)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("c_mktsegment")).as("n_segments"),
            sum(cents(col("c_acctbal"))).as("acctbal_cents"))
          .orderBy("c_nationkey"),
      """WITH g AS (SELECT *, count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS gs
        |           FROM customer),
        |a AS (SELECT * FROM g WHERE gs >= 8)
        |SELECT c_nationkey, count(*) AS n_rows,
        |  count(DISTINCT c_mktsegment) AS n_segments,
        |  cast(sum(cast(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- QUALITY-FILTER FUNNEL: cumulative attrition per source through
    //    three successive gates — length band, char entropy ≥ 3 nats,
    //    repetition (top token ≤ 1/5 of tokens) — the "which filter kills
    //    what, where" report a curation pipeline reads before tuning
    //    thresholds. Per-doc stats from two keyed shuffles ((doc, char)
    //    and (doc, word), both linear), funnel counts one groupBy --------
    ("q_quality_funnel",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        // BOTH per-doc stat structs in ONE map-side select (functions.
        // CharEntropyStats + WordRepStats): no (doc, char)/(doc, word)
        // exchanges AND no doc_id joins — the whole funnel is a scan plus
        // one sources-sized agg (the 100× spill fix, measured in SCALE.md)
        val h = log(col("st.n").cast("double")) -
          col("st.clnc_micros").cast("double") / 1e6 / col("st.n")
        docs.select(col("source"), col("n_chars"),
            graft.functions.TextExprs.charEntropyStats(col("text")).as("st"),
            graft.functions.TextExprs.wordRepStats(col("text")).as("ws"))
          .filter(col("st.n") >= 1L && col("ws.nw") >= 1L)
          .select(col("source"),
            (col("n_chars") >= 50 && col("n_chars") <= 100000).as("r1"),
            (h >= 3.0).as("r2"),
            (col("ws.maxtf") * 5 <= col("ws.nw")).as("r3"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("r1"), 1L).otherwise(0L)).as("k1"),
            sum(when(col("r1") && col("r2"), 1L).otherwise(0L)).as("k12"),
            sum(when(col("r1") && col("r2") && col("r3"), 1L).otherwise(0L))
              .as("k123"))
          .orderBy("source")
      },
      """WITH ent AS (SELECT doc_id,
        |    ln(CAST(sum(c) AS DOUBLE)) -
        |      CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)), 6)
        |        AS DECIMAL(18,6))) AS DOUBLE) / sum(c) AS h
        |  FROM (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |        FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[^\n\r\x{85}\x{2028}\x{2029}]')) AS ch
        |              FROM documents) GROUP BY 1, 2)
        |  GROUP BY 1),
        |rep AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS maxtf,
        |    CAST(sum(c) AS BIGINT) AS nw
        |  FROM (SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS c
        |        FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS wd
        |              FROM documents) GROUP BY 1, 2)
        |  GROUP BY 1),
        |r AS (SELECT d.source,
        |    d.n_chars BETWEEN 50 AND 100000 AS r1,
        |    ent.h >= 3.0 AS r2,
        |    rep.maxtf * 5 <= rep.nw AS r3
        |  FROM documents d JOIN ent USING (doc_id) JOIN rep USING (doc_id))
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        |  CAST(sum(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT) AS k12,
        |  CAST(sum(CASE WHEN r1 AND r2 AND r3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS k123
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- CHARACTER-ENTROPY quality filter: Shannon entropy of each doc's
    //    character distribution — the gibberish/repetition detector that
    //    catches what length heuristics miss (aaaa... has perfect length
    //    and zero entropy). H = ln(n) − (Σ c·ln c)/n with every ln
    //    dec6-rounded so the per-doc sum is exact; flag = H below the
    //    3-nat floor. Shape: one char explode (map-side, linear in
    //    corpus bytes) + one (doc, char) shuffle -------------------------
    ("q_char_entropy",
      (s: SparkSession, d: String) => {
        // ONE-PASS codegen'd expression (functions.CharEntropyStats) — no
        // (doc, char) exchange; clnc_micros/1e6 is bit-identical to the
        // oracle's DECIMAL(18,6) sum (the micros long IS its unscaled
        // value). Empty docs filtered like the explode form dropped them
        val h = (log(col("st.n").cast("double")) -
          col("st.clnc_micros").cast("double") / 1e6 / col("st.n"))
        t(s, d, "documents").filter(col("doc_id") < 400)
          .select(col("doc_id"),
            graft.functions.TextExprs.charEntropyStats(col("text")).as("st"))
          .filter(col("st.n") >= 1L)
          .select(col("doc_id"), col("st.n").as("n"),
            col("st.n_distinct").as("n_distinct"),
            round(h, 4).as("h"),
            (h < 3.0).as("low_entropy"))
          .orderBy("doc_id")
      },
      """WITH cc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[^\n\r\x{85}\x{2028}\x{2029}]')) AS ch
        |        FROM documents WHERE doc_id < 400)
        |  GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    sum(c * CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)))
        |      AS clnc
        |  FROM cc GROUP BY 1)
        |SELECT doc_id, n, n_distinct,
        |  round(ln(CAST(n AS DOUBLE)) - CAST(clnc AS DOUBLE) / n, 4) AS h,
        |  ln(CAST(n AS DOUBLE)) - CAST(clnc AS DOUBLE) / n < 3.0
        |    AS low_entropy
        |FROM a ORDER BY doc_id""".stripMargin),

    // -- l-diversity release gate (ops/Privacy.lDiversity): k-anonymity's
    //    homogeneity-attack fix — a (nationkey, mktsegment) group whose
    //    members all sit in ONE account-balance band leaks the band even
    //    at k=1000, so groups carrying < 3 distinct $2000 bands are suppressed.
    //    Shape: one groupBy on the quasi keys + an equi-join back on the
    //    same keys (no second shuffle under AQE exchange reuse); the
    //    audit is the survivors per nation incl. the min surviving l -----
    ("q_l_diversity",
      (s: SparkSession, d: String) => {
        val banded = t(s, d, "customer")
          .withColumn("band", expr(
            "cast(round(c_acctbal * 100) AS BIGINT) div 200000"))
        graft.ops.Privacy.lDiversity(banded,
            Seq("c_nationkey", "c_mktsegment"), "band")
          .filter(col("l_div") >= 3L)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("c_mktsegment")).as("n_segments"),
            min(col("l_div")).as("min_l"),
            sum(col("band")).as("band_sum"))
          .orderBy("c_nationkey")
      },
      """WITH g AS (SELECT *, cast(round(c_acctbal * 100) AS BIGINT) // 200000 AS band
        |           FROM customer),
        |ld AS (SELECT c_nationkey, c_mktsegment,
        |         CAST(count(DISTINCT band) AS BIGINT) AS l_div
        |       FROM g GROUP BY 1, 2),
        |a AS (SELECT g.*, ld.l_div FROM g
        |      JOIN ld USING (c_nationkey, c_mktsegment)
        |      WHERE l_div >= 3)
        |SELECT c_nationkey, count(*) AS n_rows,
        |  count(DISTINCT c_mktsegment) AS n_segments,
        |  min(l_div) AS min_l,
        |  CAST(sum(band) AS BIGINT) AS band_sum
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- Unicode NFC normalization (functions.NormalizeText) pinned
    //    cross-engine against DuckDB's utf8proc nfc_normalize: each doc's
    //    text gets a decomposed/combining suffix appended (built from
    //    chr() codepoints on BOTH sides — é as e+U+0301, Å as A+U+030A,
    //    Hangul jamo 가 as U+1100+U+1161), is normalized, and the result
    //    is hex-encoded so the compare is on raw UTF-8 bytes (two
    //    independent Unicode-normalization implementations must agree
    //    byte-for-byte). n_bytes shrinking below raw proves composition
    //    actually happened --------------------------------------------
    ("q_normalize_nfc",
      (s: SparkSession, d: String) => {
 // DECOMPOSED on purpose (explicit escapes): e+combining-acute,
        // A+combining-ring, Hangul jamo pair — NFC must compose all three
        val suffix = " caf" + "e\u0301" + " A\u030A " + "\u1100\u1161"
        val raw = concat(substring(col("text"), 1, 24), lit(suffix))
        t(s, d, "documents").filter(col("doc_id") < 300)
          .select(col("doc_id"),
            hex(encode(graft.functions.NormalizeExpr.normalize(raw, "NFC"),
              "UTF-8")).as("nfc_hex"),
            length(graft.functions.NormalizeExpr.normalize(raw, "NFC"))
              .cast("long").as("n_chars_nfc"),
            length(raw).cast("long").as("n_chars_raw"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  hex(encode(nfc_normalize(r))) AS nfc_hex,
        |  cast(length(nfc_normalize(r)) AS BIGINT) AS n_chars_nfc,
        |  cast(length(r) AS BIGINT) AS n_chars_raw
        |FROM (SELECT doc_id,
        |        substr(text, 1, 24) || ' caf' || 'e' || chr(769) ||
        |        ' A' || chr(778) || ' ' || chr(4352) || chr(4449) AS r
        |      FROM documents WHERE doc_id < 300)
        |ORDER BY doc_id""".stripMargin),

    // -- per-site BOILERPLATE removal under the gate (Dedup.boilerplate):
    //    a deterministic 8-token nav line is prepended to EVERY doc of a
    //    source (df = docs-per-source >= 3 → template, stripped from all)
    //    and a promo line to each doc_id % 11 == 0 doc (df per source
    //    straddles the threshold, so its fate differs BY SOURCE — the
    //    frequency rule itself is what the hash compare grades). Rebuilt
    //    text rides as md5, the q_line_dedup convention; injection is
    //    exactly 8 tokens so original line boundaries never shift --------
    ("q_boilerplate",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 400)
          .withColumn("text", concat(
            when(pmod(col("doc_id"), lit(11)) === 0,
              concat(lit("promo offer sale deal click buy now "), col("source"),
                lit(" "))).otherwise(lit("")),
            lit("nav menu about contact home login search "), col("source"),
            lit(" "), col("text")))
        graft.ops.Dedup
          .boilerplate(docs, "doc_id", "text", "source", width = 8, minDocs = 3)
          .select(col("doc_id"), col("n_lines"), col("n_kept"),
            md5(col("rebuilt")).as("rebuilt_md5"))
          .orderBy("doc_id")
      },
      """WITH d0 AS (
        |  SELECT doc_id, source,
        |    (CASE WHEN doc_id % 11 = 0
        |          THEN 'promo offer sale deal click buy now ' || source || ' '
        |          ELSE '' END) ||
        |    'nav menu about contact home login search ' || source || ' ' || text AS text
        |  FROM documents WHERE doc_id < 400),
        |t AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS w FROM d0),
        |d AS (SELECT doc_id, source, len(w) // 8 AS nl, i - 1 AS pos,
        |        array_to_string(w[(i-1)*8+1 : (i-1)*8+8], ' ') AS line
        |      FROM t, unnest(generate_series(1, len(w) // 8)) AS r(i)),
        |bp AS (SELECT source, line FROM (
        |         SELECT source, line, count(DISTINCT doc_id) AS df
        |         FROM d GROUP BY 1, 2)
        |       WHERE df >= 3),
        |kept AS (SELECT d.doc_id, d.pos, d.line FROM d
        |         LEFT JOIN bp ON bp.source = d.source AND bp.line = d.line
        |         WHERE bp.line IS NULL),
        |base AS (SELECT doc_id, max(nl) AS n_lines FROM d GROUP BY 1),
        |reb AS (SELECT doc_id, count(*) AS n_kept,
        |          md5(string_agg(line, ' ' ORDER BY pos)) AS rebuilt_md5
        |        FROM kept GROUP BY 1)
        |SELECT base.doc_id, cast(n_lines AS BIGINT) AS n_lines,
        |  cast(coalesce(n_kept, 0) AS BIGINT) AS n_kept, rebuilt_md5
        |FROM base LEFT JOIN reb USING (doc_id)
        |ORDER BY doc_id""".stripMargin),

    // -- URL canonicalization under the gate: deterministic synthetic
    //    URLs per doc (mixed-case scheme/host, default and non-default
    //    ports, trailing-slash runs, unsorted query params, fragments —
    //    every case the canonicalizer owns, derived identically on both
    //    sides) through UrlOps.canonicalUrl/host/registeredDomain —
    //    address-side dedup's key function, pure Column algebra, no UDF -
    ("q_url_canonical",
      (s: SparkSession, d: String) => {
        val u = syntheticUrl
        t(s, d, "documents").filter(col("doc_id") < 300)
          .select(col("doc_id"),
            graft.ops.UrlOps.canonicalUrl(u).as("canon"),
            graft.ops.UrlOps.host(u).as("host"),
            graft.ops.UrlOps.registeredDomain(u).as("domain"))
          .orderBy("doc_id")
      },
      s"""WITH u AS (SELECT doc_id, $syntheticUrlSql AS url
         |           FROM documents WHERE doc_id < 300),
         |p AS (
         |  SELECT doc_id, regexp_replace(url, '#.*$$', '') AS nf FROM u),
         |q AS (
         |  SELECT doc_id,
         |    lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
         |    lower(regexp_extract(nf, '^[^:/?#]+://([^/?#]*)', 1)) AS hostport,
         |    regexp_extract(nf, '^[^:/?#]+://[^/?#]*(.*)$$', 1) AS pathqf
         |  FROM p),
         |r AS (
         |  SELECT doc_id, scheme,
         |    regexp_replace(hostport, ':[0-9]+$$', '') AS h,
         |    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
         |    regexp_extract(pathqf, '^([^?]*)', 1) AS path,
         |    regexp_extract(pathqf, '\\?(.*)$$', 1) AS query
         |  FROM q)
         |SELECT doc_id,
         |  scheme || '://' || h ||
         |  (CASE WHEN port = '' THEN ''
         |        WHEN scheme = 'http' AND port = '80' THEN ''
         |        WHEN scheme = 'https' AND port = '443' THEN ''
         |        ELSE ':' || port END) ||
         |  (CASE WHEN rtrim(path, '/') = '' THEN '/' ELSE rtrim(path, '/') END) ||
         |  (CASE WHEN query = '' THEN ''
         |        ELSE '?' || array_to_string(list_sort(string_split(query, '&')), '&') END)
         |    AS canon,
         |  h AS host,
         |  regexp_replace(h, '^www\\.', '') AS domain
         |FROM r ORDER BY doc_id""".stripMargin),

    // -- per-domain quota curation: at most 3 docs per registered domain,
    //    chosen by the repo's deterministic md5 rank through the bounded
    //    mergeable bottom-k heap (UrlOps.domainQuota = Reservoir.sampleK
    //    per domain — ≤ k candidates per domain per partition cross the
    //    exchange). The crawl-balance step that stops one site dominating
    //    the corpus; oracle = the same rank relationally ------------------
    ("q_domain_quota",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("n_chars"), syntheticUrl.as("url"))
        val kept = graft.ops.UrlOps.domainQuota(docs, "url", "doc_id", k = 3)
        kept.join(docs, "doc_id")
          .groupBy("domain")
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).cast("long").as("chars"),
            min(col("doc_id")).as("first_id"),
            max(col("doc_id")).as("last_id"))
          .orderBy("domain")
      },
      s"""WITH u AS (SELECT doc_id, n_chars, $syntheticUrlSql AS url FROM documents),
         |dom AS (
         |  SELECT doc_id, n_chars,
         |    regexp_replace(
         |      regexp_replace(lower(regexp_extract(regexp_replace(url, '#.*$$', ''),
         |        '^[^:/?#]+://([^/?#]*)', 1)), ':[0-9]+$$', ''),
         |      '^www\\.', '') AS domain
         |  FROM u),
         |ranked AS (
         |  SELECT domain, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY domain
         |      ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM dom)
         |SELECT domain, count(*) AS n_kept,
         |  cast(sum(n_chars) AS BIGINT) AS chars,
         |  min(doc_id) AS first_id, max(doc_id) AS last_id
         |FROM ranked WHERE rk <= 3
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  /** Deterministic synthetic URL per document (both engines build the
    * identical string): mixed-case scheme/host, default port on http
    * (stripped) AND https (kept — :80 on https is NOT default), a
    * non-default port, trailing-slash runs, unsorted query params, and a
    * fragment, each keyed off doc_id residues.
    */
  private def syntheticUrl: org.apache.spark.sql.Column =
    concat(
      when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTP")).otherwise(lit("https")),
      lit("://"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit("WWW.")).otherwise(lit("www.")),
      col("source"), lit(".Example.COM"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit(":80"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit(":8080")).otherwise(lit("")),
      lit("/Path/"), pmod(col("doc_id"), lit(50)).cast("string"),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("///")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 0, lit("?b=2&a=1")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(7)) === 0, lit("#frag")).otherwise(lit("")))

  private def syntheticUrlSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
      |    (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'www.' END) ||
      |    source || '.Example.COM' ||
      |    (CASE WHEN doc_id % 3 = 0 THEN ':80'
      |          WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END) ||
      |    '/Path/' || cast(doc_id % 50 AS VARCHAR) ||
      |    (CASE WHEN doc_id % 4 = 0 THEN '///' ELSE '' END) ||
      |    (CASE WHEN doc_id % 5 = 0 THEN '?b=2&a=1' ELSE '' END) ||
      |    (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)""".stripMargin
}
