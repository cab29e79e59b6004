package graft.sources

import graft.SparkSuite
import graft.api.Database

/** The S11 ingestion path: `.sql` dump → typed DataFrames. Golden-checked
  * against the reference's own fixture (`data/parch-and-posey.sql`,
  * connection.py:64-78 + utils.py:242-265) when it is present.
  */
class SqlDumpSpec extends SparkSuite {

  test("parseDdl: columns, constraints skipped, quoted names, decimal types") {
    val defs = SqlDump.parseDdl(
      """BEGIN TRANSACTION;
        |CREATE TABLE web_events (
        |  id integer,
        |  occurred_at timestamp,
        |  channel bpchar
        |);
        |CREATE TABLE IF NOT EXISTS "money" (
        |  amt numeric(10,2),
        |  rate double precision,
        |  note text,
        |  PRIMARY KEY (amt)
        |);
        |COMMIT;""".stripMargin)
    assert(defs.map(_.name) == Seq("web_events", "money"))
    assert(defs(0).schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("id", "bigint"), ("occurred_at", "string"), ("channel", "string")))
    assert(defs(1).schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("amt", "decimal(10,2)"), ("rate", "double"), ("note", "string")))
  }

  test("parseDdl: all four SQLite identifier quoting styles, quoted constraint-keyword columns") {
    // FTS shadow tables dump with SINGLE-quoted names ('docs_fts_data');
    // MySQL-style backticks and MS-style brackets are accepted by SQLite
    // and appear in migrated dumps. A QUOTED "primary" is a column named
    // primary, not a PRIMARY KEY constraint line.
    val defs = SqlDump.parseDdl(
      """CREATE TABLE 'docs_fts_data' (id INTEGER, block BLOB);
        |CREATE TABLE `metrics` (`when ts` text, [value] real, "primary" integer);
        |CREATE TABLE [odd names] ("a""b" integer, 'c''d' text);""".stripMargin)
    assert(defs.map(_.name) == Seq("docs_fts_data", "metrics", "odd names"))
    assert(defs(0).cols.map(_.name) == Seq("id", "block"))
    assert(defs(1).cols.map(_.name) == Seq("when ts", "value", "primary"))
    assert(defs(1).schema.map(_.dataType.simpleString) ==
      Seq("string", "double", "bigint"))
    assert(defs(2).cols.map(_.name) == Seq("a\"b", "c'd"))
  }

  test("single-quoted / backtick / bracket INSERT table names parse end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graftsqlquote").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "q.sql"),
      """CREATE TABLE 'tq' (a integer, b text);
        |INSERT INTO 'tq' VALUES (1, 'x');
        |INSERT INTO `tq` VALUES (2, 'y');
        |INSERT INTO [tq] ("b", a) VALUES ('z', 3);
        |INSERT INTO tq VALUES (4, 'w');""".stripMargin.getBytes)
    val rows = SqlDump.open(spark, dir + "/q.sql")("tq").orderBy("a")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w")))
    SqlDump.release(dir + "/q.sql")
  }

  test("parseValues: quotes, escaped quotes, NULL, multi-tuple statements") {
    val one = SqlDump.parseValues(
      "INSERT INTO t VALUES (1,'O''Brien, Jr. (x)',NULL,'2015-10-06 17:13:58');", 4)
    assert(one == Seq(Seq("1", "O'Brien, Jr. (x)", null, "2015-10-06 17:13:58")))
    // a quoted 'NULL' is the string, a bare NULL is null
    assert(SqlDump.parseValues("INSERT INTO t VALUES ('NULL',NULL);", 2) ==
      Seq(Seq("NULL", null)))
    val multi = SqlDump.parseValues("INSERT INTO t VALUES (1,'a'),(2,'b'),(3,NULL);", 2)
    assert(multi == Seq(Seq("1", "a"), Seq("2", "b"), Seq("3", null)))
  }

  test("parseValues anchors on the statement's VALUES keyword, not a VALUES-ish table name") {
    // a table named `tvalues` with an explicit column list: indexOf("VALUES")
    // would start at the column list and inject a garbage ("a","b") row
    assert(SqlDump.parseValues("INSERT INTO tvalues (a, b) VALUES (1, 2);", 2) ==
      Seq(Seq("1", "2")))
    assert(SqlDump.parseValues("""INSERT INTO "tvalues" VALUES (7, 'x');""", 2) ==
      Seq(Seq("7", "x")))
  }

  test("parseValues fails loudly on truncated statements instead of dropping rows") {
    // quoted value with an embedded newline: line-splitting leaves an
    // unterminated literal on the first physical line
    val e1 = intercept[IllegalArgumentException] {
      SqlDump.parseValues("INSERT INTO t VALUES (1, 'line one", 2)
    }
    assert(e1.getMessage.contains("unterminated quoted literal"))
    // tuple split across lines -> unterminated tuple
    val e2 = intercept[IllegalArgumentException] {
      SqlDump.parseValues("INSERT INTO t VALUES (1, 2", 2)
    }
    assert(e2.getMessage.contains("unterminated VALUES tuple"))
    // pg_dump multi-row style with tuples on their own lines -> the VALUES
    // line itself yields nothing
    val e3 = intercept[IllegalArgumentException] {
      SqlDump.parseValues("INSERT INTO t VALUES", 2)
    }
    assert(e3.getMessage.contains("no complete VALUES tuple"))
    // arity mismatch is a parse error, not a silent drop
    val e4 = intercept[IllegalArgumentException] {
      SqlDump.parseValues("INSERT INTO t VALUES (1, 2, 3);", 2)
    }
    assert(e4.getMessage.contains("arity"))
  }

  test("open refuses a dump whose non-INSERT bulk would flood the driver") {
    val dir = java.nio.file.Files.createTempDirectory("graftsqlbulk").toString
    val p = java.nio.file.Paths.get(dir, "bulk.sql")
    val w = java.nio.file.Files.newBufferedWriter(p)
    try {
      w.write("CREATE TABLE t (a integer);\n")
      w.write("INSERT INTO t VALUES (1);\n")
      val comment = "-- " + ("x" * 997) + "\n"
      (0 until 9000).foreach(_ => w.write(comment)) // ~9 MB of comments
    } finally w.close()
    val e = intercept[IllegalArgumentException] {
      SqlDump.open(spark, p.toString)
    }
    assert(e.getMessage.contains("non-INSERT content"))
    SqlDump.release(p.toString)
  }

  test("release drops the cached dump text and is idempotent; exit releases") {
    val dir = java.nio.file.Files.createTempDirectory("graftsqlrel").toString
    val p = java.nio.file.Paths.get(dir, "r.sql")
    java.nio.file.Files.write(p,
      "CREATE TABLE t (a integer);\nINSERT INTO t VALUES (1);\n".getBytes)
    val db = Database.open(spark, p.toString)
    assert(db("t").len == 1)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    db.exit() // releases the dump text via SqlDump.release
    SqlDump.release(p.toString) // idempotent
  }

  test("explicit column-list INSERT reorders into DDL order, nulls omitted columns") {
    val dir = java.nio.file.Files.createTempDirectory("graftsqldump").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "d.sql"),
      """CREATE TABLE t (a integer, b text, c integer);
        |INSERT INTO t (c, a) VALUES (30, 1);
        |INSERT INTO t (b, a, c) VALUES ('x', 2, 60);
        |INSERT INTO t VALUES (3, 'y', 90);""".stripMargin.getBytes)
    val tables = SqlDump.open(spark, dir + "/d.sql")
    val rows = tables("t").orderBy("a").collect()
      .map(r => (r.get(0), r.get(1), r.get(2))).toSeq
    assert(rows == Seq((1L, null, 30L), (2L, "x", 60L), (3L, "y", 90L)))
  }

  test("the documented .db workaround end-to-end: sqlite3 .dump output of forestation.db opens") {
    // the `.dump` route remains supported alongside the direct binary open
    // (SqliteFileSpec): `sqlite3 forestation.db .dump > forestation.sql`
    // then Database.open("forestation.sql"). The fixture is real
    // `.dump`-format output of the reference's data/forestation.db
    // (schema + 40 rows/table).
    val res = getClass.getResource("/forestation_subset.sql")
    assume(res != null, "forestation dump fixture missing")
    val db = Database.open(spark, res.getPath)
    assert(db.tables == Seq("forest_area", "land_area", "regions"))
    // typed per SQLite affinity: INTEGER -> bigint, REAL -> double
    val fa = db("forest_area").toDf
    assert(fa.schema("year").dataType.simpleString == "bigint")
    assert(fa.schema("forest_area_sqkm").dataType.simpleString == "double")
    // golden rows vs the reference database content
    val aruba = db.query(
      "SELECT year, forest_area_sqkm FROM forest_area WHERE country_code = 'ABW' ORDER BY year DESC LIMIT 1")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(aruba == Seq((2016L, 4.199999869)))
    val la = db.query(
      "SELECT total_area_sq_mi FROM land_area WHERE country_code = 'ABW' AND year = 2016")
      .collect().map(_.getDouble(0)).toSeq
    assert(la == Seq(69.5))
    assert(db("regions").toDf.where("income_group = 'Low income'").count() > 0)
    db.exit()
    // the direct .db open now succeeds too — through the pure-JVM binary
    // reader (no JDBC jar in this build); equivalence with the dump twin
    // is asserted table-by-table in SqliteFileSpec
    if (new java.io.File("/root/reference/data/forestation.db").isFile) {
      val direct = Database.open(spark, "/root/reference/data/forestation.db")
      assert(direct.tables === Seq("forest_area", "land_area", "regions"))
      direct.exit()
    }
  }

  test("opens the reference parch-and-posey dump: catalog, counts, golden join") {
    val dump = new java.io.File("/root/reference/data/parch-and-posey.sql")
    assume(dump.isFile, "reference fixture not present in this environment")
    val db = Database.open(spark, dump.getPath)
    assert(db.tables.sorted ==
      Seq("accounts", "orders", "region", "sales_reps", "web_events"))
    assert(db("orders").len == 6912)
    assert(db("web_events").len == 9073)
    assert(db("accounts").len == 351)
    assert(db("sales_reps").len == 50)
    assert(db("region").len == 4)
    // typed per SQLite affinity: numeric(10,2) → decimal, timestamp → string
    val o = db("orders")
    assert(o.toDf.schema("total_amt_usd").dataType.simpleString == "decimal(10,2)")
    assert(o.toDf.schema("occurred_at").dataType.simpleString == "string")
    // the README 3-table join demo (README.md:602-628): 351 rows, dup renames
    val out = db.query(
      """SELECT * FROM accounts
        |JOIN sales_reps ON accounts.sales_rep_id = sales_reps.id
        |JOIN region ON sales_reps.region_id = region.id""".stripMargin)
    assert(out.count() == 351)
    assert(out.columns.count(_.startsWith("id")) >= 3)
    // value-level spot check against the parquet fixture conversion
    val fixture = Database.open(spark, getClass.getResource("/parchposey").getPath)
    val a = db.query("SELECT id, name, sales_rep_id FROM accounts ORDER BY id")
      .collect().map(_.toSeq)
    val b = fixture.query("SELECT id, name, sales_rep_id FROM accounts ORDER BY id")
      .collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
