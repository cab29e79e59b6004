package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-directory table layout — the write path of a corpus store.
  *
  * At 100 TB the dominant cost of most queries is the scan, and the scan
  * cost is set at WRITE time: a corpus laid out as `lang=en/…` directories
  * with rows sorted by key inside each file gives every later reader
  * directory-level partition pruning (the `lang = 'en'` filter never opens
  * the other directories) plus parquet row-group min/max skipping on the
  * sort key — no index structure to maintain, just layout. Complements
  * [[Partitioning.saveBucketed]] (bucketed layout for exchange-free joins)
  * and [[Partitioning.zOrderLayout]] (two-dimensional skipping).
  *
  * Reference scope: pandas-db reads whole SQLite tables (table.py's
  * SELECT-from-table model); a partition-pruned parquet store is the
  * Spark-native equivalent of its per-table files, scaled out.
  */
object Layout {

  /** Write `df` under `dir` as `partitionCol=value/` parquet directories,
    * one file per partition value (unless `maxRecordsPerFile` splits it),
    * rows sorted by `sortCols` within each file.
    *
    * The `repartition(col)` clusters each partition value into exactly one
    * task, so a value's rows land in ONE file per directory instead of one
    * file per upstream task × directory — the small-files failure mode of a
    * naive `partitionBy` write from a wide shuffle (1000 tasks × 100 langs
    * = 100k files). `maxRecordsPerFile` caps file size back up where a
    * single value is too big for one file (the hot-partition case).
    */
  def writePartitioned(df: DataFrame, dir: String, partitionCol: String,
      sortCols: Seq[String], maxRecordsPerFile: Long = 0L): Unit = {
    val clustered = df.repartition(col(partitionCol))
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
    val w = clustered.write.mode("overwrite").partitionBy(partitionCol)
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(dir)
  }

  /** Rewrite a partitioned store in place with one file per partition
    * directory, rows re-sorted by `sortCols` — the compaction pass that
    * undoes small-file accumulation from incremental appends. Writes to a
    * sibling temp dir, then atomically swaps (local-FS rename; on an object
    * store this would be a two-phase commit via the committer protocol).
    */
  def compact(spark: SparkSession, dir: String, partitionCol: String,
      sortCols: Seq[String]): Unit = {
    val tmp = dir.stripSuffix("/") + "__compacting"
    writePartitioned(spark.read.parquet(dir), tmp, partitionCol, sortCols)
    val dirP = java.nio.file.Paths.get(dir)
    val tmpP = java.nio.file.Paths.get(tmp)
    deleteRecursively(dirP.toFile)
    java.nio.file.Files.move(tmpP, dirP)
    ()
  }

  /** Append a batch to an existing partitioned store — same per-value
    * clustering and in-file sort as [[writePartitioned]], but additive:
    * each append lands ONE new file per touched partition directory.
    * Fragmentation grows by one file per batch per value; [[compact]] is
    * the periodic remedy (spec'd together in LayoutSpec).
    */
  def append(df: DataFrame, dir: String, partitionCol: String,
      sortCols: Seq[String]): Unit = {
    df.repartition(col(partitionCol))
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
      .write.mode("append").partitionBy(partitionCol).parquet(dir)
  }

  /** Dedup-screened incremental ingest: append only the rows of `batch`
    * whose `keyExpr` (a content key — e.g. `md5(col("text"))`) does not
    * already exist in the store. The screen scans ONLY the key expression's
    * input columns of the existing store (column-pruned parquet scan) and
    * anti-joins — rows duplicated WITHIN the batch are both kept, matching
    * append semantics; pre-dedup the batch first when that matters.
    *
    * At 100 TB the anti-join's store side is keys-only (a fraction of the
    * data width) and AQE picks broadcast when the BATCH side is small —
    * and a [[Bloom.bloomAntiJoin]] prefilter can screen the obvious
    * non-dups before the exact join (same pattern as the streaming
    * curation loop in DocStream.curateStream).
    */
  def ingest(batch: DataFrame, dir: String, partitionCol: String,
      sortCols: Seq[String], keyExpr: org.apache.spark.sql.Column): Unit = {
    val spark = batch.sparkSession
    val existingKeys = spark.read.parquet(dir)
      .select(keyExpr.as("__k")).distinct()
    val fresh = batch.withColumn("__k", keyExpr)
      .join(existingKeys, Seq("__k"), "left_anti")
      .drop("__k")
    append(fresh, dir, partitionCol, sortCols)
  }

  /** Data files per partition directory — the compaction health metric. */
  def filesPerPartition(dir: String): Map[String, Int] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains("="))
      .map(d => d.getName ->
        Option(d.listFiles()).getOrElse(Array.empty)
          .count(f => f.getName.endsWith(".parquet") || f.getName.endsWith(".orc")))
      .toMap

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
    ()
  }
}
