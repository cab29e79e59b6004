package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Query-relevance ranking over a text corpus — the retrieval-side
  * counterpart of the TF-IDF scoring in graft.queries.TextOps.
  */
object Ranking {

  /** Okapi BM25 top-k documents for a bag of query terms (Robertson et al.,
    * TREC-3; the `+1` idf smoothing is the Lucene variant, which keeps idf
    * positive for terms in more than half the corpus).
    *
    * Determinism (cross-engine hash-exact under the DuckDB oracle gate):
    * idf is pre-rounded to 6 decimals, each per-term contribution is
    * rounded to 6 decimals and summed as DECIMAL(18,6) — the sum is exact
    * and independent of partial-aggregation order — then the final score
    * rounds to 4. All remaining arithmetic is single IEEE ops written in
    * the same order on both sides. Ties at the top-k boundary break on the
    * id.
    *
    * Scale: document length is a map-side `size(tokens)` — the token rows
    * themselves are never shuffled for it (the explode-and-count form would
    * exchange every token); the explode feeding tf is filtered to the query
    * terms before its aggregate, so only matching-term rows reach a
    * shuffle; the per-term frames are tiny and the joins hint-free — AQE
    * broadcasts them at any realistic term count. Nothing here is
    * quadratic in corpus size. N/avgdl count every document, including
    * zero-token ones (the standard BM25 convention).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val dl = docs.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit("\\S+"), lit(0)))
        .cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs.select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("word"))
      .filter(col("word").isin(terms: _*))
      .groupBy(idCol, "word").agg(count(lit(1)).as("tf"))
    val dfw = tf.groupBy("word").agg(countDistinct(col(idCol)).as("df"))
    val idf = dfw.crossJoin(stats.select("n_docs"))
      .select(col("word"),
        round(log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))), 6).as("idf"))
    val contrib = tf.join(idf, "word").join(dl, idCol)
      .crossJoin(stats.select("avgdl"))
      .select(col(idCol),
        round(col("idf") * col("tf") * (lit(k1) + lit(1)) /
          (col("tf") + lit(k1) * (lit(1) - lit(b) + lit(b) * col("dl") / col("avgdl"))), 6)
          .cast(DecimalType(18, 6)).as("contrib"))
    contrib.groupBy(idCol)
      .agg(round(sum(col("contrib")).cast("double"), 4).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** Exact phrase search through a positional inverted index: documents
    * containing `phrase` as CONSECUTIVE whitespace-delimited tokens, with
    * the 1-based word position of the first occurrence and the total
    * occurrence count (overlapping occurrences counted — the positional
    * join sees every start position, which char-replace counting cannot).
    *
    * Shape: postings (doc, position, term) from one posexplode; the
    * phrase's terms self-join at fixed offsets, ANCHORED on the phrase's
    * globally rarest term — every subsequent join keys on (doc, pos), so
    * candidate rows shrink to the rarest term's postings immediately,
    * never the commonest. This is the inverted-index plan a search engine
    * runs; the q_phrase_search oracle checks it against an independent
    * char-scan (LIKE + replace arithmetic) rather than a replay of the
    * same join.
    */
  /** RAKE keyword phrases (Rose et al. 2010, "Automatic keyword
    * extraction from individual documents"), corpus-level: candidate
    * phrases are maximal stopword-free token runs (tokens =
    * `[a-z]+` over the lowercased text — a punctuation-insensitive
    * simplification of RAKE's phrase breaks, applied identically in the
    * oracle), capped at `maxLen` words; word scores are the classic
    * degree/frequency ratio with deg(w) = Σ |phrase| over w's candidate
    * occurrences — carried as INTEGER ppm via truncating division (the
    * rational-score discipline: round(double) forms split engines on
    * half-boundaries); a phrase scores the sum of its words' ppm, and the
    * corpus keeps the top `topK` distinct phrase texts (ties broken by
    * the phrase string).
    *
    * Returns (phrase, n [instances], score_ppm), best first. Scale: one
    * tokenize explode (linear), a doc-partitioned window for the
    * stopword-split, one groupBy(word) for stats, keyed joins — no
    * doc-pair term anywhere; the only global step is the final top-K.
    */
  def rakePhrases(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], maxLen: Int = 4, topK: Int = 20): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)"))
        .as(Seq("p", "word")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("p")
    val runs = toks
      .withColumn("st",
        when(col("word").isin(stopwords: _*), 1L).otherwise(0L))
      .withColumn("sid", sum(col("st")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .filter(col("st") === 0L)
    val plen = runs.groupBy(col(idCol), col("sid"))
      .agg(count(lit(1)).as("plen"))
    val cand = runs.join(plen, Seq(idCol, "sid"))
      .filter(col("plen") <= maxLen.toLong)
    val wordPpm = cand.groupBy("word")
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("word"), expr("(deg * 1000000L) div freq").as("wppm"))
    val inst = cand.join(wordPpm, "word")
      .groupBy(col(idCol), col("sid"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("p"), col("word")))),
          x => x.getField("word")), " ").as("phrase"),
        sum(col("wppm")).cast("long").as("score_ppm"))
    inst.groupBy("phrase")
      .agg(count(lit(1)).as("n"), max(col("score_ppm")).as("score_ppm"))
      .orderBy(desc("score_ppm"), asc("phrase"))
      .limit(topK)
  }

  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame = {
    val terms = phrase.trim.split("\\s+").toSeq
    require(terms.nonEmpty && terms.head.nonEmpty, "phraseSearch needs a non-empty phrase")
    // \S+ extraction, NOT split-on-space: runs of whitespace (double
    // spaces, tabs, the fixture's embedded newlines) must separate
    // adjacent tokens — split(" ") would emit empty tokens that shift
    // every position and break cross-whitespace matches, diverging from
    // the repo-wide tokenization (bm25TopK, Dedup.docLines, NaiveBayes).
    // Column-API form, not expr-string interpolation: a caller's column
    // name with dots/spaces/keywords must resolve as a NAME, never parse
    // as SQL
    val tok = docs.select(col(idCol).as("__d"),
      posexplode(regexp_extract_all(col(textCol), lit("\\S+"), lit(0)))
        .as(Seq("__p", "__t")))
    // anchor on the rarest term: one tiny count-by-term over the phrase's
    // terms only (filtered before the shuffle)
    val counts = tok.filter(col("__t").isin(terms: _*))
      .groupBy("__t").agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val anchorIdx = terms.zipWithIndex
      .minBy { case (t, i) => (counts.getOrElse(t, 0L), i) }._2
    var m = tok.filter(col("__t") === terms(anchorIdx))
      .select(col("__d"), (col("__p") - anchorIdx).as("__p"))
    terms.indices.filter(_ != anchorIdx).foreach { i =>
      m = m.join(tok.filter(col("__t") === terms(i))
        .select(col("__d"), (col("__p") - i).as("__p")), Seq("__d", "__p"))
    }
    m.groupBy(col("__d").as(idCol))
      .agg((min(col("__p")) + 1).as("first_pos"), count(lit(1)).as("n_occ"))
  }
}
