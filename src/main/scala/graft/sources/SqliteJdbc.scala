package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Binary SQLite ingestion over JDBC — the reference opens `.db`/`.sqlite`/
  * `.sqlite3` files directly (reference: connection.py:64-78), and this
  * closes that last gap WITHOUT adding a dependency: everything here is
  * `java.sql` (in the JDK) plus Spark's own JDBC source, so the build stays
  * zero-dep and the reader activates only when the caller has put a
  * sqlite-jdbc driver jar on the classpath (`--jars sqlite-jdbc-*.jar`).
  * Without one, [[Database.open]] raises the reference's FileTypeError with
  * the `sqlite3 .dump` workaround — fail-loud, never a silent stub.
  *
  * Scale note: a SQLite file is a single local file — an inherently
  * single-reader source, like the `.sql` dump path. The right production
  * pattern is ingest-once: open, then write each table to parquet and query
  * that. The JDBC scan itself is one bounded pass per table (no driver-side
  * materialization of rows — Spark's JDBC source streams partitions), which
  * is the best any engine can do against this container.
  */
object SqliteJdbc {

  private val DriverClass = "org.sqlite.JDBC"

  /** True when a sqlite-jdbc driver is on the classpath. */
  def driverAvailable: Boolean =
    try { Class.forName(DriverClass); true }
    catch { case _: ClassNotFoundException => false }

  /** Open every user table of a SQLite file as a DataFrame. The table list
    * comes from one tiny driver-side `sqlite_master` query; the data reads
    * go through Spark's JDBC source (lazy — nothing is scanned until a
    * table is queried).
    */
  def open(spark: SparkSession, path: String): Map[String, DataFrame] = {
    val url = s"jdbc:sqlite:$path"
    val conn = java.sql.DriverManager.getConnection(url)
    val names =
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT name FROM sqlite_master WHERE type = 'table' " +
            "AND name NOT LIKE 'sqlite_%' ORDER BY name")
        val b = Seq.newBuilder[String]
        while (rs.next()) b += rs.getString(1)
        b.result()
      } finally conn.close()
    names.map { n =>
      n -> spark.read.format("jdbc")
        .option("url", url)
        .option("driver", DriverClass)
        // quoted so names with spaces/keywords survive (the CSV path
        // sanitizes; SQLite table names are kept verbatim like the
        // reference keeps them)
        .option("dbtable", "\"" + n.replace("\"", "\"\"") + "\"")
        .load()
    }.toMap
  }

  /** The file's `CREATE VIEW` statements parsed to [[SqlDump.ViewDef]]s,
    * via one tiny driver-side sqlite_master query (reference
    * connection.py:123-131).
    */
  def views(path: String): Seq[SqlDump.ViewDef] = {
    val conn = java.sql.DriverManager.getConnection(s"jdbc:sqlite:$path")
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT sql FROM sqlite_master WHERE type = 'view' " +
          "AND name NOT LIKE 'sqlite_%' ORDER BY rowid")
      val b = Seq.newBuilder[String]
      while (rs.next()) b += rs.getString(1)
      b.result().flatMap(sql => SqlDump.parseViews(sql))
    } finally conn.close()
  }
}
