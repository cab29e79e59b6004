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

  test("paths with URI-special characters (space, %, #) still read footers") {
    // Spark can write to a space path; the %/# dir is populated by file
    // copy (those chars are legal on the filesystem but illegal in a raw
    // URI — exactly what the string-concat Path construction mis-parsed)
    val base = java.nio.file.Files.createTempDirectory("manifest spec ")
    val plain = base.resolve("st ore").toString
    docs.limit(100).coalesce(1).write.parquet(plain)
    assert(Manifest.manifest(spark, plain, "doc_id")
      .collect().map(_.getLong(2)).sum === 100L)
    val nasty = base.resolve("100% #frag")
    java.nio.file.Files.createDirectories(nasty)
    val src = new java.io.File(plain).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(src.toPath, nasty.resolve(src.getName))
    assert(Manifest.manifest(spark, nasty.toString, "doc_id")
      .collect().map(_.getLong(2)).sum === 100L)
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

  test("underscore/dot entries are invisible, matching Spark's file index") {
    val dir = java.nio.file.Files.createTempDirectory("manifest_tmp_")
      .resolve("store").toString
    docs.limit(100).write.parquet(dir)
    val clean = Manifest.manifest(spark, dir, "doc_id")
      .agg(sum("n_rows")).head().getLong(0)
    // a crashed write's _temporary attempt files must NOT be counted —
    // Spark's reader ignores them, so the health report must too
    val tmp = new java.io.File(s"$dir/_temporary/0")
    tmp.mkdirs()
    docs.limit(7).write.mode("overwrite")
      .parquet(s"$dir/_temporary/0/attempt.parquet")
    assert(Manifest.manifest(spark, dir, "doc_id")
      .agg(sum("n_rows")).head().getLong(0) === clean)
    assert(clean === 100L)
  }

  test("disjointRanges compares NUMERICALLY for non-integer stats") {
    import spark.implicits._
    // [9.2, 9.9] and [10.5, 11.0] are disjoint; lexicographic order
    // ("10.5" < "9.2") would report them overlapping
    val disjoint = Seq(("f1", 0, 10L, "9.2", "9.9"),
      ("f2", 0, 10L, "10.5", "11.0"))
      .toDF("file", "row_group", "n_rows", "min_value", "max_value")
    assert(Manifest.disjointRanges(disjoint))
    val overlap = Seq(("f1", 0, 10L, "9.2", "10.7"),
      ("f2", 0, 10L, "10.5", "11.0"))
      .toDF("file", "row_group", "n_rows", "min_value", "max_value")
    assert(!Manifest.disjointRanges(overlap))
    // strings still compare lexicographically
    val strs = Seq(("f1", 0, 10L, "aa", "am"), ("f2", 0, 10L, "an", "az"))
      .toDF("file", "row_group", "n_rows", "min_value", "max_value")
    assert(Manifest.disjointRanges(strs))
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

  test("pruneFiles skips disjoint files on a sorted layout, keeps statless ones") {
    val dir = java.nio.file.Files.createTempDirectory("manifest_prune_")
      .resolve("store").toString
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "user_id")
    Partitioning.sortedLayout(ev, Seq("user_id"), 8).write.parquet(dir)
    val all = Option(new java.io.File(dir).listFiles()).get
      .count(f => f.getName.endsWith(".parquet"))
    assert(all >= 6, s"expected a multi-file store, got $all")
    val mx = ev.agg(max(col("user_id"))).head().getLong(0)
    val (lo, hi) = (mx * 2 / 10, mx * 4 / 10)
    val kept = Manifest.pruneFiles(spark, dir, "user_id",
      BigDecimal(lo), BigDecimal(hi))
    // a ~20% range over a range-partitioned layout must skip MOST files...
    assert(kept.nonEmpty && kept.size < all,
      s"pruning kept ${kept.size} of $all files")
    // ...and lose no qualifying row: survivors + residual == full scan
    val expected = ev.filter(col("user_id").between(lo, hi)).count()
    val got = spark.read.parquet(kept: _*)
      .filter(col("user_id").between(lo, hi)).count()
    assert(got === expected)
    // out-of-domain range: every file provably disjoint
    assert(Manifest.pruneFiles(spark, dir, "user_id",
      BigDecimal(mx + 10), BigDecimal(mx + 20)).isEmpty)
    // a file with no stats for the column can never be pruned: parquet
    // always writes stats here, so simulate via a column of all NULLs
    val nullDir = java.nio.file.Files.createTempDirectory("manifest_prune_")
      .resolve("nulls").toString
    ev.limit(10).select(col("event_id"),
      lit(null).cast("long").as("user_id")).write.parquet(nullDir)
    assert(Manifest.pruneFiles(spark, nullDir, "user_id",
      BigDecimal(0), BigDecimal(1)).nonEmpty,
      "statless files must be kept — pruning may only skip provably-disjoint files")
  }
}
