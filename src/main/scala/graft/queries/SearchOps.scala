package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Retrieval queries whose oracle is an INDEPENDENT algorithm, not a
  * replay: [[graft.ops.Ranking.phraseSearch]] answers through a positional
  * inverted index (postings self-joined at fixed offsets), while the
  * DuckDB side re-derives the same (doc, first_pos, n_occ) rows by pure
  * character scanning — LIKE containment plus replace()-difference
  * arithmetic. Hash equality therefore proves index == scan, the property
  * a search index exists to preserve.
  *
  * The char-scan trick: strip leading/trailing whitespace, collapse
  * every internal whitespace RUN (spaces, tabs, the fixture's embedded
  * newlines — the \S+ token separators) to a double space, pad with one
  * space each side, and double the phrase's internal spaces too.
  * Boundary spaces then come in pairs, so consecutive phrase occurrences
  * share no characters and non-overlapping replace() counting is exact
  * (the test phrases have all-distinct words, so overlapping starts are
  * impossible — the positional join would count those too, char replace
  * cannot). The first occurrence's word index falls out of the space
  * count in the prefix: spaces_before_match = 1 + 2·(word−1).
  */
object SearchOps {

  type Fn = (SparkSession, String) => DataFrame

  /** (phrase, common two-term + rare three-term) — both present at every
    * shipped SF, chosen to exercise dense and sparse postings.
    */
  private val Phrases = Seq("data query", "slow fast batch")

  private def oracleOne(ph: String): String = {
    val needle = " " + ph.split(" ").mkString("  ") + " "
    s"""SELECT '$ph' AS phrase, doc_id,
       |  CAST(((strpos(d2, '$needle') - 1
       |    - strlen(replace(substr(d2, 1, strpos(d2, '$needle') - 1), ' ', ''))) // 2)
       |    + 1 AS BIGINT) AS first_pos,
       |  CAST((strlen(d2) - strlen(replace(d2, '$needle', '')))
       |    // strlen('$needle') AS BIGINT) AS n_occ
       |FROM (SELECT doc_id, ' ' || regexp_replace(regexp_replace(text,
       |        '^\\s+|\\s+$$', '', 'g'), '\\s+', '  ', 'g') || ' ' AS d2
       |      FROM documents)
       |WHERE strpos(d2, '$needle') > 0""".stripMargin
  }

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- exact phrase search, index vs scan: postings join anchored on the
    //    phrase's rarest term (candidates shrink immediately; the common
    //    term's postings are probed by (doc,pos), never enumerated) -------
    ("q_phrase_search",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        Phrases.map { ph =>
          graft.ops.Ranking.phraseSearch(docs, "doc_id", "text", ph)
            .withColumn("phrase", lit(ph))
        }.reduce(_.unionByName(_))
          .select(col("phrase"), col("doc_id"),
            col("first_pos").cast("long").as("first_pos"), col("n_occ"))
          .orderBy("phrase", "doc_id")
      },
      Phrases.map(oracleOne).mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY phrase, doc_id")))
}
