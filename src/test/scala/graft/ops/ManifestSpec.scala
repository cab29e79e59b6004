package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Footer-manifest structure: per-file/per-row-group granularity over a
  * written store, the disjoint-ranges layout health check, metadata-only
  * cost, and fail-loud unknown columns. Stat-decode correctness against
  * ground truth is under the hash gate (q_manifest).
  */
class ManifestSpec extends SparkSuite {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("multi-file store: one manifest row per file, sorted files disjoint") {
    val dir = java.nio.file.Files.createTempDirectory("manifest_spec_")
      .resolve("store").toString
    val en = docs.filter(col("lang") === "en")
    val perFile = (en.count() / 4 + 1) max 1
    Layout.writePartitioned(en, dir, "lang", Seq("doc_id"),
      maxRecordsPerFile = perFile)
    val m = Manifest.manifest(spark, s"$dir/lang=en", "doc_id")
    val rows = m.collect()
    assert(rows.length >= 3, s"expected several files, got ${rows.length}")
    // counts fold back to the data
    assert(rows.map(_.getLong(2)).sum === en.count())
    // sorted-within-dir writes give per-file doc_id ranges that do not
    // overlap — exactly the property point lookups prune on
    assert(Manifest.disjointRanges(m), "sorted store must be disjoint")
    // two unsorted appends of the SAME rows destroy disjointness
    Layout.append(en.limit(50), dir, "lang", Seq("doc_id"))
    Layout.append(en.limit(50), dir, "lang", Seq("doc_id"))
    assert(!Manifest.disjointRanges(
      Manifest.manifest(spark, s"$dir/lang=en", "doc_id")),
      "overlapping appends must show up as degraded skipping")
  }

  test("string columns decode via UTF8; unknown columns fail loud") {
    val m = Manifest.manifest(spark, s"$sfDir/documents.parquet", "lang")
      .collect()
    assert(m.nonEmpty)
    val mins = m.map(_.getString(3))
    assert(mins.forall(_.matches("[a-z]{2}")), s"got ${mins.toSeq}")
    val e = intercept[org.apache.spark.SparkException] {
      Manifest.manifest(spark, s"$sfDir/documents.parquet", "no_such_col")
        .collect()
    }
    assert(e.getMessage.contains("no_such_col") ||
      Option(e.getCause).exists(_.getMessage.contains("no_such_col")))
  }

  test("manifest is metadata-only: no data pages are read") {
    // the whole-documents manifest must complete while reading orders of
    // magnitude fewer bytes than the table holds; proxy assertion: the
    // scan row count reported to Spark is the FILE count, not the table's
    val files = 1 // single-file table
    val m = Manifest.manifest(spark, s"$sfDir/documents.parquet", "doc_id")
    assert(m.count() >= files)
    // structural: the plan contains no parquet FileScan of the table (we
    // parallelize the file list, not the data)
    val plan = m.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan parquet"), plan)
  }
}
