package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** MANIFEST-POINTER COMMITS — the object-store-safe commit layer the
  * [[Fs]] scaladoc defers to ("a table format whose manifest commit
  * replaces directory renames").
  *
  * [[Layout]]'s whole-directory swap protocol rests on `FileSystem.rename`
  * atomicity, which flat-namespace object stores (s3/gs/oss — rename is
  * copy+delete there) do not provide; [[Fs.rename]] refuses them loudly.
  * This store removes the rename from the commit path entirely, the way
  * published log-structured table formats do (Delta Lake's `_delta_log`
  * JSON actions — Armbrust et al., VLDB 2020; Iceberg's metadata-pointer
  * snapshots): the set of LIVE data files is named by a versioned pointer
  * file, and every mutation — append, compaction, whole-store re-partition
  * — is (1) write NEW immutable data files nobody references yet, then
  * (2) publish them by writing ONE small commit file. Readers resolve the
  * highest COMPLETE commit and read exactly the files it names.
  *
  * Correctness needs NO rename atomicity anywhere:
  *  - data files are immutable and unreferenced until a commit names them;
  *    a crash mid-write/mid-move leaves an invisible orphan ([[vacuumOrphans]]
  *    reaps it);
  *  - the commit file itself carries a completeness trailer (`#end <n>`);
  *    a torn commit write is detectable and IGNORED — readers serve the
  *    previous version, [[recover]] deletes the fragment. A new-version
  *    commit file either validates or it doesn't exist yet, which is the
  *    same either-or a single-object PUT gives on S3;
  *  - the old files stay live until the new commit lands, so there is no
  *    instant with less than one complete copy on disk.
  *
  * Single-writer protocol, like the rest of the maintenance family (the
  * reference engine is single-process: /root/reference/pandasdb/
  * connection.py:17 holds one sqlite3 connection); concurrent READERS are
  * always safe — they see the old version until the new commit file is
  * complete.
  *
  * Scale (the 100 TB question): a commit is one small-file write regardless
  * of data size — the op that required a whole-store directory swap in
  * [[Layout.evolvePartitions]] is here a pointer flip ([[rewriteAll]]).
  * The pointer lists one line (~50-100 bytes) per live file: a 100 TB
  * store at the 1 GB file sizing [[Layout.compactPartitions]] targets is
  * ~100k lines / a few MB — a metadata read, not a data read. Growth
  * beyond that is what log CHECKPOINTING exists for in the published
  * formats; this layer keeps the log trivially small instead by writing
  * the full live set each commit and retiring old versions in
  * [[vacuumOrphans]].
  */
object PointerStore {

  private val Header = "#graft-pointer v1"

  private def base(dir: String): String = dir.stripSuffix("/")

  private def commitsDir(dir: String): Path =
    Fs.path(s"${base(dir)}/_commits")

  private def commitPath(dir: String, v: Long): Path =
    new Path(commitsDir(dir), f"v$v%08d.commit")

  private val CommitName = "v(\\d{8})\\.commit".r

  /** All commit versions present (valid or torn), ascending. */
  private def commitVersions(dir: String): Seq[Long] =
    Fs.list(commitsDir(dir)).flatMap { st =>
      st.getPath.getName match {
        case CommitName(n) => Some(n.toLong)
        case _ => None
      }
    }.sorted

  /** Parse one commit file; None when absent or TORN (bad header, missing
    * or count-mismatched trailer — the crash-mid-commit signature).
    */
  private def parseCommit(dir: String, v: Long): Option[Seq[String]] = {
    val p = commitPath(dir, v)
    if (!Fs.isFile(p)) return None
    val lines = Fs.readUTF8(p).linesIterator.toVector
    if (lines.isEmpty || lines.head != Header) return None
    val files = lines.drop(1).dropRight(1)
    if (lines.last != s"#end ${files.size}") return None
    Some(files)
  }

  /** Highest COMPLETE commit: (version, live relative paths). Torn
    * fragments of a crashed later commit are skipped, which IS the
    * crash recovery for readers — no repair step needed before reading.
    */
  def currentCommit(dir: String): Option[(Long, Seq[String])] =
    commitVersions(dir).sorted(Ordering[Long].reverse)
      .iterator.flatMap(v => parseCommit(dir, v).map(v -> _))
      .nextOption()

  def currentVersion(dir: String): Option[Long] = currentCommit(dir).map(_._1)

  /** Live data files, store-relative (partition dirs included). */
  def liveFiles(dir: String): Seq[String] =
    currentCommit(dir)
      .getOrElse(throw new IllegalStateException(
        s"no complete pointer commit under $dir/_commits — not a pointer store (run init)"))
      ._2

  /** Write commit `v` — the ONE publish step. A direct create-and-write
    * (no rename): the trailer makes a torn write self-invalidating, so
    * this is safe on every scheme including the ones [[Fs.rename]]
    * refuses. Refuses to overwrite an existing version (single-writer
    * violation = loud stop, not silent last-wins).
    */
  private def writeCommit(dir: String, v: Long, files: Seq[String]): Long = {
    val p = commitPath(dir, v)
    if (Fs.exists(p)) {
      // a COMPLETE v here means two writers raced — loud stop. A TORN v is
      // our own crashed previous attempt (readers never resolved it); the
      // retry may overwrite it, or the next commit at this version would
      // deadlock behind a fragment forever.
      if (parseCommit(dir, v).isDefined)
        throw new IllegalStateException(
          s"commit v$v already exists under $dir — concurrent writer?")
      Fs.deleteFile(p)
    }
    Fs.mkdirs(commitsDir(dir))
    val body = (Header +: files.sorted :+ s"#end ${files.size}").mkString("\n")
    Fs.writeUTF8(p, body)
    v
  }

  /** Walk the store's DATA files (relative paths), skipping `_commits`,
    * `_stage_*`, dotfiles — the same hidden-entry rule Spark's file index
    * applies.
    */
  private def dataFiles(dir: String): Seq[String] = {
    val b = base(dir)
    def walk(p: Path, prefix: String): Seq[String] =
      Fs.list(p).flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(".") || n.startsWith("_")) Seq.empty
        else if (st.isFile) {
          if (n.endsWith(".parquet")) Seq(s"$prefix$n") else Seq.empty
        } else walk(st.getPath, s"$prefix$n/")
      }
    walk(Fs.path(b), "")
  }

  /** Adopt an existing partitioned parquet directory (e.g. a
    * [[Layout.writePartitioned]] store) as commit v1. */
  def init(dir: String): Long = {
    require(currentCommit(dir).isEmpty,
      s"$dir already has a pointer commit — init is once")
    val files = dataFiles(dir)
    require(files.nonEmpty, s"no parquet data files under $dir to adopt")
    writeCommit(dir, 1L, files)
  }

  /** The read path: exactly the live files of the current commit —
    * partition columns recovered from the directory names via basePath.
    * New data files being staged or already moved in but not yet
    * committed are invisible here by construction.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val b = base(dir)
    val files = liveFiles(dir).map(f => s"$b/$f")
    spark.read.option("basePath", b).parquet(files: _*)
  }

  private def stageDir(dir: String, v: Long, tag: String): String =
    s"${base(dir)}/_stage_v$v$tag"

  /** TIME TRAVEL: the read path pinned to an explicit committed version —
    * what the retention window of [[vacuumOrphans]] exists to serve.
    * Because data files are immutable and every commit lists its full
    * live set, reading "as of v" is just resolving v's pointer; no
    * snapshot copy, no log replay. Throws on a version that is absent,
    * torn, or already retired past the vacuum window.
    */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val files = parseCommit(dir, v).getOrElse(
      throw new IllegalArgumentException(
        s"no complete commit v$v under $dir/_commits — retired by vacuum, " +
          "torn, or never written"))
    val b = base(dir)
    spark.read.option("basePath", b).parquet(files.map(f => s"$b/$f"): _*)
  }

  /** Stage `df` as new partition-dir parquet under `stage`, then move
    * every staged file into the store under its partition-relative name.
    * Returns the moved files' store-relative paths. Nothing here is
    * published — the caller's commit does that.
    */
  private def stageIn(df: DataFrame, dir: String, stage: String,
      partitionCol: String, sortCols: Seq[String]): Seq[String] = {
    val clustered = df.repartition(col(partitionCol))
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
    clustered.write.mode("overwrite").partitionBy(partitionCol).parquet(stage)
    val staged = dataFiles(stage)
    staged.foreach { rel =>
      Fs.moveFileUncommitted(Fs.path(s"$stage/$rel"),
        Fs.path(s"${base(dir)}/$rel"))
    }
    Fs.deleteRecursively(Fs.path(stage))
    staged
  }

  /** Append rows: stage → move in → ONE commit-file write. */
  def append(df: DataFrame, dir: String, partitionCol: String,
      sortCols: Seq[String]): Long = {
    val (v, live) = currentCommit(dir).getOrElse(
      throw new IllegalStateException(s"$dir is not a pointer store"))
    val staged = stageIn(df, dir, stageDir(dir, v + 1, "append"),
      partitionCol, sortCols)
    writeCommit(dir, v + 1, live ++ staged)
  }

  /** Partition column name encoded in the live paths (`lang=en/…`). */
  private def partitionColOf(live: Seq[String]): String = {
    val cols = live.map(_.split('/').head.split('=').head).distinct
    require(cols.size == 1 && live.head.contains("="),
      s"pointer store is not single-column partition-dir laid out: $cols")
    cols.head
  }

  /** Compaction WITHOUT a directory swap: rewrite every fragmented
    * partition dir (more than one live file) into one sorted file, move
    * the rewrites in, and publish with one commit that drops the old
    * fragments from the live set. The fragments stay on disk — still
    * readable through the OLD commit version — until [[vacuumOrphans]].
    * Returns the new version, or the current one when nothing is
    * fragmented (no-op, no commit burned).
    */
  def compact(spark: SparkSession, dir: String,
      sortCols: Seq[String]): Long = {
    val (v, live) = currentCommit(dir).getOrElse(
      throw new IllegalStateException(s"$dir is not a pointer store"))
    val byDir = live.groupBy(f => f.split('/').dropRight(1).mkString("/"))
    val fragged = byDir.filter(_._2.size > 1)
    if (fragged.isEmpty) return v
    val pcol = partitionColOf(live)
    val b = base(dir)
    val victims = fragged.values.flatten.toSeq
    val df = spark.read.option("basePath", b)
      .parquet(victims.map(f => s"$b/$f"): _*)
    val staged = stageIn(df, dir, stageDir(dir, v + 1, "compact"),
      pcol, sortCols)
    writeCommit(dir, v + 1, (live.toSet -- victims ++ staged).toSeq)
  }

  /** WHOLE-STORE re-partition — [[Layout.evolvePartitions]] without the
    * store-wide directory swap that op needs: every row is rewritten under
    * `newPartitionCol` dirs (the unavoidable data cost at any scale), but
    * the cutover is ONE commit-file write, and a crash at any point leaves
    * the old version fully live. The old layout's files (and eventually
    * dirs) retire via [[vacuumOrphans]].
    */
  def rewriteAll(spark: SparkSession, dir: String, newPartitionCol: String,
      sortCols: Seq[String]): Long = {
    val (v, _) = currentCommit(dir).getOrElse(
      throw new IllegalStateException(s"$dir is not a pointer store"))
    val staged = stageIn(read(spark, dir), dir,
      stageDir(dir, v + 1, "rewrite"), newPartitionCol, sortCols)
    writeCommit(dir, v + 1, staged)
  }

  /** Retire what no current reader needs: data files no commit within the
    * retention window references, stage leftovers, commit files older than
    * the last `keepCommits` versions, and partition dirs left empty. The
    * grace window is VERSIONS, not wall time — a reader pinned to version
    * `current - keepCommits + 1` or newer still sees every file it
    * resolved. Returns the deleted data files' relative paths.
    */
  def vacuumOrphans(dir: String, keepCommits: Int = 2): Seq[String] = {
    require(keepCommits >= 1, "keepCommits must be >= 1")
    val b = base(dir)
    val versions = commitVersions(dir)
    val (cur, _) = currentCommit(dir).getOrElse(
      throw new IllegalStateException(s"$dir is not a pointer store"))
    val keepFrom = cur - (keepCommits - 1)
    // every file referenced by ANY kept commit stays (a pinned reader on
    // an old kept version must still resolve)
    val retained: Set[String] = versions.filter(_ >= keepFrom)
      .flatMap(v => parseCommit(dir, v).getOrElse(Seq.empty)).toSet
    val orphans = dataFiles(dir).filterNot(retained)
    orphans.foreach { f =>
      val p = Fs.path(s"$b/$f")
      Fs.deleteFile(p)
      // checksum-FS sidecar of the retired file (Spark's local committer
      // writes `.name.crc` next to each part file) — a stale sidecar would
      // keep the partition dir "non-empty" forever
      val crc = new Path(p.getParent, s".${p.getName}.crc")
      if (Fs.exists(crc)) Fs.deleteFile(crc)
    }
    // retired + torn commit files (anything below the window; a torn file
    // ABOVE the current version is a crashed in-flight commit — recover's
    // job, left alone here)
    versions.filter(_ < keepFrom).foreach(v => Fs.deleteFile(commitPath(dir, v)))
    // stage leftovers and now-empty partition dirs
    Fs.list(Fs.path(b)).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("_stage_"))
        Fs.deleteRecursively(st.getPath)
      else if (st.isDirectory && !n.startsWith("_") &&
          Fs.list(st.getPath).forall(_.getPath.getName.startsWith(".")))
        // "empty" = no visible entries; leftover dot-sidecars go with it
        Fs.deleteRecursively(st.getPath)
    }
    orphans.sorted
  }

  /** Crash cleanup: delete stage leftovers and TORN commit fragments.
    * Never required for correctness (readers skip torn commits, orphans
    * are invisible) — this just reclaims the scratch space immediately.
    */
  def recover(dir: String): Unit = {
    val b = base(dir)
    Fs.list(Fs.path(b)).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith("_stage_"))
        Fs.deleteRecursively(st.getPath)
    }
    commitVersions(dir)
      .filter(v => parseCommit(dir, v).isEmpty)
      .foreach(v => Fs.deleteFile(commitPath(dir, v)))
  }
}
