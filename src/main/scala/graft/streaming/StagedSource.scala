package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Staging writer for the streaming gates' file-replay sources
  * (optimization round 16, guide §1.2 "remove unnecessary passes" /
  * §2.6): the gates used to build their N mtime-ordered slice files with
  * N sequential `slice-filter → coalesce(1) → append` jobs — each one a
  * full scan of the gate's input — plus a directory re-listing and mtime
  * fix-up per slice. [[write]] lands every slice in ONE Spark job (the
  * slice index becomes a partition column; a hash repartition on it puts
  * each slice in exactly one task, so each slice is exactly one file)
  * and then sequences the files with driver-side renames + mtimes.
  *
  * The staged bytes are identical per slice to the old per-slice writes
  * (same rows, same slice boundaries — callers compute the boundary
  * literals with the same integer arithmetic as before), and the file
  * source's mtime ordering contract is unchanged: file of slice i gets
  * mtime `now − 10 min + i × 1 min`, exactly the old protocol.
  */
object StagedSource {

  /** Write `df` (data columns + an integral slice-index column
    * `sliceCol`) as one parquet file per distinct slice value under
    * `src`, mtime-staggered in slice order. The slice column is NOT in
    * the written files (it becomes the scratch partition directory).
    * Slices with no rows produce no file — callers' sentinel slices are
    * driver-built and never empty.
    */
  def write(df: DataFrame, sliceCol: String, src: String): Unit = {
    val scratch = src.stripSuffix("/") + ".__stage"
    df.repartition(col(sliceCol))
      .write.mode("overwrite").partitionBy(sliceCol).parquet(scratch)
    val srcDir = new java.io.File(src)
    srcDir.mkdirs()
    val base = System.currentTimeMillis() - 600000L
    new java.io.File(scratch).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(s"$sliceCol="))
      .sortBy(_.getName.stripPrefix(s"$sliceCol=").toLong)
      .foreach { d =>
        val i = d.getName.stripPrefix(s"$sliceCol=").toLong
        d.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex
          .foreach { case (f, j) =>
            val dst = new java.io.File(srcDir, f"slice-$i%04d-$j%d.parquet")
            require(f.renameTo(dst), s"staging rename failed: $f -> $dst")
            require(dst.setLastModified(base + i * 60000L),
              s"staging mtime set failed: $dst")
          }
      }
    graft.ops.Layout.deleteRecursively(new java.io.File(scratch))
  }
}
