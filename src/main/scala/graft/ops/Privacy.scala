package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation: scan a text
  * column for e-mail addresses, phone numbers, and IPv4 literals, count
  * them, and rewrite them to typed placeholder tokens.
  *
  * Everything is a codegen'd built-in (`regexp_extract_all` /
  * `regexp_replace`) — map-only, no shuffle, no UDF — so a redaction pass
  * over 100 TB is a single scan that parallelizes per input split. The
  * patterns deliberately stay inside the regex subset shared by Java's
  * engine and RE2 (no lookbehind, no backrefs) so the same patterns drive
  * the DuckDB oracle for q_pii_redact bit-identically.
  */
object Privacy {

  /** user@host.tld — local part, @, dotted domain, 2+ letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style short dial string: 3 digits, dash, 4 digits. */
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 literal (syntactic — no octet range check). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private def count(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Adds `n_emails`, `n_phones`, `n_ips` (long) counting matches in
    * `textCol`. One scan, three codegen'd extractions.
    */
  def detect(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    df.withColumn("n_emails", count(c, EmailRe))
      .withColumn("n_phones", count(c, PhoneRe))
      .withColumn("n_ips", count(c, Ipv4Re))
  }

  /** The redaction expression alone: e-mails first (their domains can
    * contain dotted digit runs an IP pass would half-eat), then IPv4,
    * then phone strings.
    */
  def redactExpr(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Replaces `textCol` in place with its redacted form. */
  def redact(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, redactExpr(col(textCol)))

  /** Adds `group_size`: how many rows share this row's quasi-identifier
    * combination — the k-anonymity measure (a row is k-anonymous iff
    * group_size ≥ k). A PARTITIONED window count: one hash exchange on
    * the quasi-identifier columns, state bounded per group, no global
    * window — the same shuffle a groupBy would pay, but keeping every
    * row so the caller can audit or suppress.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    // functions.count, not this object's private regex-count helper
    df.withColumn("group_size",
      org.apache.spark.sql.functions.count(lit(1)).over(w))
  }

  /** Rows whose quasi-identifier combination occurs at least `k` times —
    * the suppression pass that makes a release k-anonymous (rows in
    * smaller groups are re-identifiable and dropped). The helper column
    * does not survive.
    */
  def suppressSmallGroups(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame =
    kAnonymity(df, quasiCols)
      .filter(col("group_size") >= k)
      .drop("group_size")

  /** Adds `l_div`: how many DISTINCT `sensitiveCol` values the row's
    * quasi-identifier group carries — the l-diversity measure (Machanava-
    * jjhala et al. 2007): a k-anonymous group whose members all share one
    * sensitive value still leaks it (the homogeneity attack), so release
    * gates require l ≥ threshold distinct values per group. count(DISTINCT)
    * has no window form, so this is a groupBy + join back — NULL-SAFE on
    * the quasi columns, because [[kAnonymity]]'s window treats a NULL
    * quasi value as a group and a plain equi-join would silently DROP
    * those rows instead (neither annotated nor suppressed — the worst
    * outcome for a privacy gate). The join keys on the same columns the
    * groupBy hashed, so AQE plans one exchange reuse, not a second full
    * shuffle.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    val groups = df.groupBy(quasiCols.map(col): _*)
      .agg(org.apache.spark.sql.functions
        .countDistinct(col(sensitiveCol)).as("l_div"))
    val renamed = quasiCols.foldLeft(groups)(
      (g, c) => g.withColumnRenamed(c, s"__q_$c"))
    df.join(renamed,
        quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _))
      .drop(quasiCols.map(c => s"__q_$c"): _*)
  }

  /** Rows whose quasi-identifier group carries at least `l` distinct
    * sensitive values — [[suppressSmallGroups]]' l-diversity analogue.
    * The helper column does not survive.
    */
  def suppressLowDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame =
    lDiversity(df, quasiCols, sensitiveCol)
      .filter(col("l_div") >= l)
      .drop("l_div")

  /** Deterministic keyed pseudonymization of an identifier column:
    * sha256(secret ‖ length-framed value), hex. The same value under the
    * same secret always maps to the same token, so tokenized datasets
    * still JOIN and GROUP consistently — the standard release shape when
    * raw user ids cannot leave the boundary — while reversal requires
    * the secret (length framing blocks the trivial concat ambiguity
    * sha256(k ‖ v) has: (k="s", v="1x") vs (k="s1", v="x")). NULL stays
    * NULL (a present-but-tokenized null would fabricate a joinable
    * value). Codegen'd built-ins only — one map-side expression, no
    * shuffle, no UDF.
    *
    * NOT encryption: a secret holder can confirm a GUESSED value by
    * recomputing (dictionary attack on low-entropy ids) — for release
    * gates compose with [[suppressSmallGroups]] so rare identifiers are
    * gone before tokens are published.
    */
  def tokenizeExpr(c: Column, secret: String): Column =
    when(c.isNotNull,
      sha2(concat(
        lit(secret.length.toString), lit("|"), lit(secret),
        length(c.cast("string")).cast("string"), lit("|"), c.cast("string")),
        256))

  /** Replaces `idCol` in place with its token. */
  def tokenize(df: DataFrame, idCol: String, secret: String): DataFrame =
    df.withColumn(idCol, tokenizeExpr(col(idCol), secret))
}
