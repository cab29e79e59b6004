package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ShingleExpr

/** Reference-LM quality scoring and importance weighting for corpus
  * curation — the two model-based filters of the standard LLM data
  * pipeline that sit between the heuristic rules (TextOps quality /
  * repetition) and dedup:
  *
  *  - [[unigramCrossEntropy]]: CCNet-style (Wenzek et al. 2020,
  *    arXiv:1911.00359) scoring of every document against a language
  *    model trained on a trusted reference slice. CCNet uses a KenLM
  *    5-gram; the add-one-smoothed unigram form here is the exactly
  *    SQL-expressible baseline with the same filtering semantics
  *    (rank by cross-entropy, drop the worst tail).
  *  - [[dsirLogWeights]]: DSIR (Xie et al. 2023, arXiv:2302.03169)
  *    hashed n-gram importance weights ln(p_target(f)/p_raw(f)) summed
  *    over each document's features — the importance-resampling score
  *    for matching a raw crawl to a target distribution.
  *
  * Determinism (both engines must hash-match): every ln() is rounded to
  * 6 decimals and carried as DECIMAL(18,6), so per-doc sums are exact
  * and order-independent; the only IEEE ops are single divisions and the
  * final round-4 (the BM25 recipe, [[Ranking.bm25TopK]]).
  *
  * Scale shape (100 TB corpus): the token/feature explode is map-side;
  * per-doc term frequencies shuffle once on (id, term); the model side
  * collapses to a vocabulary (millions of rows) or a fixed bucket table
  * (`buckets` rows) that broadcasts back — no shuffle is ever keyed on
  * anything that grows with corpus size except the document id itself.
  */
object LangModel {

  private def toks(c: Column): Column =
    regexp_extract_all(c, lit("\\S+"), lit(0))

  private val LnScale = 6

  private def dec6(c: Column): Column =
    round(c, LnScale).cast(org.apache.spark.sql.types.DecimalType(18, 6))

  /** Per-document cross-entropy under an INTERPOLATED bigram LM (λ = 1/2
    * Jelinek–Mercer mix of add-one bigram and add-one unigram), trained on
    * the `refPred` slice — one modeling step up from
    * [[unigramCrossEntropy]] toward CCNet's KenLM 5-gram while staying
    * exactly SQL-replayable. Position 1 scores by the unigram alone (no
    * context); position i ≥ 2 by
    * −ln( ((c_bi(prev,cur)+1)/(c_ctx(prev)+V+1) + p_uni(cur)) / 2 ).
    * Unseen contexts take c_ctx = 0 (the add-one floor), so OOV text
    * degrades smoothly instead of zeroing. Same determinism contract as
    * the unigram form: every ln dec6-rounded, per-doc sums exact.
    *
    * Scale shape: the bigram explode is map-side; per-doc pair counts
    * shuffle once on (id, prev, cur); the model side is two ref-vocabulary
    * tables (bigrams + contexts) that broadcast — still nothing keyed on
    * corpus size but the doc id.
    */
  def bigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
      refPred: Column): DataFrame = {
    // tokenize ONCE into a materialized column — a HOF lambda re-evaluates
    // inlined expressions per element, so tokenizing inside the transform
    // would re-run the regex per POSITION: O(len²) per doc (measured 784 s
    // at 100× before this; the q_line_filter lesson)
    // empty/whitespace-only docs tokenize to size(w) = 0, where
    // sequence(1, 0) yields the DESCENDING [1, 0] and element_at(w, 0)
    // throws — filter them out (they have no positions to score anyway)
    val pos = docs
      .select(col(idCol), toks(col(textCol)).as("w"))
      .filter(size(col("w")) >= 1)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(w)), i -> struct(" +
          "element_at(w, i) AS cur, " +
          "CASE WHEN i > 1 THEN element_at(w, i - 1) END AS prev))"))
        .as("p"))
      .select(col(idCol), col("p.cur").as("cur"), col("p.prev").as("prev"))
    val pairs = pos.groupBy(idCol, "prev", "cur")
      .agg(count(lit(1)).as("cnt"))
    val refIds = docs.filter(refPred).select(col(idCol))
    // ONE ref-slice scan feeds the whole model side: the aggregated
    // (prev, cur, bc) table is model-sized and pins safely; rb/rc/vocab
    // derive from it without re-tokenizing (vocab = Σ bc per cur, because
    // every position appears exactly once as `cur` — first tokens as the
    // prev-NULL rows). Without this the tokenize+explode ran 3× per call.
    // DISK_ONLY, not localCheckpoint: on an adversarial corpus (every
    // token unique) the "model" is itself corpus-sized, and pinning it
    // in deserialized memory blocks is the q_spearman OOM shape — disk
    // blocks spill gracefully and the three readers still share one scan
    val refAgg = pos.join(refIds, Seq(idCol), "left_semi")
      .groupBy("prev", "cur").agg(count(lit(1)).as("bc"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // the bigram vocabulary grows ~quadratically faster than the unigram
    // one on natural text, so its broadcast is GUARDED: small model →
    // broadcast, big model → keyed shuffle join (the correct large shape)
    val rb = refAgg.filter(col("prev").isNotNull)
    val nRb = rb.count()
    val rc = rb.groupBy("prev").agg(sum(col("bc")).as("pc"))
    val vocab = refAgg.groupBy(col("cur").as("word"))
      .agg(sum(col("bc")).as("wc"))
    val stats = vocab.agg(sum(col("wc")).as("n_ref"),
      count(lit(1)).as("v_ref"))
    val pu = (coalesce(col("wc"), lit(0L)) + lit(1)).cast("double") /
      (col("n_ref") + col("v_ref") + lit(1)).cast("double")
    val pb = (coalesce(col("bc"), lit(0L)) + lit(1)).cast("double") /
      (coalesce(col("pc"), lit(0L)) + col("v_ref") + lit(1)).cast("double")
    val out = pairs
      .join(PlanHints.maybeBroadcastSmall(rb, nRb), Seq("prev", "cur"), "left")
      .join(PlanHints.maybeBroadcastSmall(rc, nRb), Seq("prev"), "left")
      .join(PlanHints.maybeBroadcastSmall(vocab, nRb),
        col("cur") === col("word"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("lnp",
        when(col("prev").isNull, dec6(log(pu)))
          .otherwise(dec6(log((pb + pu) / 2.0))))
      .groupBy(idCol)
      .agg(sum(col("cnt")).as("n_tok"),
        round((-sum(col("cnt") * col("lnp"))).cast("double") / sum(col("cnt")), 4)
          .as("xent"))
      // eager-materialize the RESULT (one 3-col row per doc — orders of
      // magnitude under the text it scores, spillable) so refAgg can be
      // released HERE: returning lazily would leak one DISK_ONLY cached
      // RDD per invocation for the life of the session (the verify
      // driver runs hundreds of queries in one session)
      .localCheckpoint(true)
    refAgg.unpersist(false)
    out
  }

  /** Per-document cross-entropy (nats/token) under an add-one-smoothed
    * unigram LM trained on the `refPred` slice of `docs`:
    * p(w) = (c_ref(w) + 1) / (N_ref + V_ref + 1), OOV words take the
    * c=0 floor. Output: (idCol, n_tok, xent) for every document with at
    * least one token, ordered by nothing (caller sorts). Perplexity is
    * exp(xent) — monotone, so threshold filtering is equivalent.
    *
    * Reference behavior: pandas-db has no model-based scoring; this is
    * pipeline breadth per the build brief (quality scoring beyond
    * length/punct heuristics).
    */
  def unigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
      refPred: Column): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(toks(col(textCol))).as("word"))
    val tf = tok.groupBy(idCol, "word").agg(count(lit(1)).as("tf"))
    val vocab = docs.filter(refPred)
      .select(explode(toks(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))
    val stats = vocab.agg(sum(col("wc")).as("n_ref"),
      count(lit(1)).as("v_ref"))
    // lnp is computed per (doc, word) row rather than per vocab word so
    // OOV words (absent from vocab) share the same expression tree; the
    // inputs (wc, n_ref, v_ref) are integers, so the double division and
    // ln see bit-identical arguments in any engine.
    tf.join(broadcast(vocab), Seq("word"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("lnp", dec6(log(
        (coalesce(col("wc"), lit(0L)) + lit(1)).cast("double") /
          (col("n_ref") + col("v_ref") + lit(1)).cast("double"))))
      .groupBy(idCol)
      .agg(sum(col("tf")).as("n_tok"),
        round((-sum(col("tf") * col("lnp"))).cast("double") / sum(col("tf")), 4)
          .as("xent"))
  }

  /** Cross-engine 60-bit md5 prefix → non-negative bucket in [0, buckets).
    * Matches DuckDB `('0x'||substr(md5(f),1,15))::BIGINT % buckets`.
    */
  private def bucketOf(c: Column, buckets: Int): Column =
    pmod(conv(substring(md5(c), 1, 15), 16, 10).cast("long"), lit(buckets))

  /** The hashing trick (Weinberger et al. 2009): each document becomes a
    * fixed-`dims`-dimensional sparse count vector in LONG form —
    * (idCol, dim, v) with v = Σ sign(token) over tokens hashing to dim,
    * zero cells absent. Signed hashing makes collisions cancel in
    * expectation instead of always inflating. Two disjoint md5 substrings
    * supply them: dim = first-15-hex-digits mod dims, sign = parity of
    * the 16th hex digit — both pure integer ops, so the vectorizer is
    * bit-deterministic, engine-replayable, and needs no vocabulary: the
    * shuffle keys on (id, dim), bounded per doc by dims, and no global
    * dictionary build or broadcast exists at any scale.
    */
  def hashingVectorize(docs: DataFrame, idCol: String, textCol: String,
      dims: Int = 256): DataFrame = {
    require(dims >= 2, "hashingVectorize: dims must be >= 2")
    docs.select(col(idCol), explode(toks(col(textCol))).as("tok"))
      .select(col(idCol),
        bucketOf(col("tok"), dims).as("dim"),
        when(pmod(conv(substring(md5(col("tok")), 16, 1), 16, 10)
          .cast("long"), lit(2L)) === 0L, lit(1L))
          .otherwise(lit(-1L)).as("sign"))
      .groupBy(col(idCol), col("dim")).agg(sum(col("sign")).as("v"))
      .filter(col("v") =!= 0L)
  }

  /** DSIR log importance weight per document over hashed unigram+bigram
    * features: logw(d) = Σ_f n_d(f) · [ln p_target(bucket(f)) −
    * ln p_raw(bucket(f))] with add-one smoothing over `buckets` buckets,
    * target = the `targetPred` slice, raw = all of `docs`. Output:
    * (idCol, n_feat, logw); higher = more target-like. The two lns are
    * rounded to 6 decimals independently and differenced in DECIMAL, so
    * the per-doc sum is exact.
    */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "dsirLogWeights needs a positive bucket count")
    def feats(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ explode(concat(toks(col(textCol)),
        ShingleExpr.orderedShingles(col(textCol), 2))).as("feat"): _*)
        .withColumn("bk", bucketOf(col("feat"), buckets))
    // ONE tokenize+shingle pass over the corpus (optimization round 16,
    // guide §1.2 "remove unnecessary passes": raw counts, target counts
    // and the per-doc bucket counts each re-derived the exploded feature
    // stream — three full corpus tokenizations). The (doc, bucket) count
    // frame with the target flag is everything downstream needs, and it
    // is doc×occupied-bucket sized — far below the exploded stream — so
    // it checkpoints cheaply. The target flag is constant per doc
    // (targetPred is a document predicate), so (id, bk) stays a key.
    val db = feats(docs, col(idCol), targetPred.as("__t"))
      .groupBy(col(idCol), col("__t"), col("bk"))
      .agg(count(lit(1)).as("nb"))
      .localCheckpoint(true)
    val raw = db.groupBy("bk").agg(sum(col("nb")).as("cr"))
    // filter(__t) drops nulls exactly like docs.filter(targetPred) did
    val tgt = db.filter(col("__t")).groupBy("bk").agg(sum(col("nb")).as("ct"))
    val nr = raw.agg(sum(col("cr")).as("nr"))
    val nt = tgt.agg(sum(col("ct")).as("nt"))
    // raw covers every occupied bucket (target ⊆ raw), so the llr table
    // is keyed on raw's buckets — ≤ `buckets` rows, broadcast both ways.
    val llr = raw.join(tgt, Seq("bk"), "left")
      .crossJoin(nr).crossJoin(nt)
      .select(col("bk"),
        (dec6(log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
          (col("nt") + lit(buckets)).cast("double"))) -
         dec6(log((col("cr") + lit(1)).cast("double") /
           (col("nr") + lit(buckets)).cast("double")))).as("llr"))
    db.select(col(idCol), col("bk"), col("nb"))
      .join(broadcast(llr), "bk")
      .groupBy(idCol)
      .agg(sum(col("nb")).as("n_feat"),
        round(sum(col("nb") * col("llr")).cast("double"), 4).as("logw"))
  }
}
