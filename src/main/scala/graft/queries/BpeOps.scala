package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import Q._

/** Tokenizer-training queries: [[graft.ops.Bpe.learnMerges]] learns the
  * ordered BPE merge table from the documents corpus, and the DuckDB
  * oracle replays the SAME rounds as chained CTEs — pair counting by list
  * comprehension, argmax with the identical (freq DESC, lhs, rhs)
  * tie-break, merge application as the identical two-pass replace — so
  * the learned vocabulary compares hash-for-hash. Everything is string
  * and integer arithmetic; no float tolerance anywhere.
  */
object BpeOps {

  type Fn = (SparkSession, String) => DataFrame

  private val Merges = 6

  private def iterCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""p$i AS (
         |  SELECT pr[1] AS a, pr[2] AS b, sum(freq) AS pf FROM (
         |    SELECT unnest([[syms[j], syms[j+1]] for j in range(1, len(syms))]) AS pr, freq
         |    FROM (SELECT string_split(trim(w), ' ') AS syms, freq FROM w${i - 1}) s
         |    WHERE len(syms) >= 2) q
         |  GROUP BY 1, 2),
         |b$i AS (SELECT a, b, pf FROM p$i ORDER BY pf DESC, a, b LIMIT 1),
         |w$i AS (SELECT replace(replace(w, ' '||a||' '||b||' ', ' '||a||b||' '),
         |               ' '||a||' '||b||' ', ' '||a||b||' ') AS w, freq
         |        FROM w${i - 1} CROSS JOIN b$i)""".stripMargin
    }.mkString(",\n")

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- BPE vocabulary training: 6 merge rounds over the corpus's
    //    word-frequency table (ONE corpus-sized shuffle, then vocab-sized
    //    rounds). Output = the ordered merge table ------------------------
    ("q_bpe_train",
      (s: SparkSession, d: String) =>
        graft.ops.Bpe.learnMerges(t(s, d, "documents"), "text", Merges)
          .withColumnRenamed("left", "lhs").withColumnRenamed("right", "rhs")
          .orderBy("step"),
      s"""WITH w0 AS (
         |  SELECT ' ' || regexp_replace(tok, '(.)', '\\1 ', 'g') AS w,
         |         count(*) AS freq
         |  FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok
         |        FROM documents) q
         |  WHERE regexp_full_match(tok, '[a-z]+')
         |  GROUP BY 1),
         |${iterCtes(Merges)}
         |SELECT CAST(step AS BIGINT) AS step, a AS lhs, b AS rhs,
         |  CAST(pf AS BIGINT) AS pair_freq
         |FROM (${(1 to Merges).map(i =>
                s"SELECT $i AS step, a, b, pf FROM b$i").mkString("\n  UNION ALL ")}) u
         |ORDER BY step""".stripMargin)
  )
}
