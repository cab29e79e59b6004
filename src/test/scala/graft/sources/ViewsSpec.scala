package graft.sources

import graft.SparkSuite
import graft.api.{Database, InvalidTableError}

/** Persistent views defined INSIDE an opened database file (sqlite_master
  * `type='view'` rows / a dump's CREATE VIEW statements) — the reference
  * lists them via `db.views` and serves `get_columns` on them
  * (connection.py:123-131, 150-160) while `db[...]` stays tables-only
  * (connection.py:247-261). Exercised through BOTH file readers on twin
  * fixtures from scripts/gen_sqlite_fixtures.py.
  */
class ViewsSpec extends SparkSuite {

  private def res(name: String): String = {
    val r = getClass.getResource("/" + name)
    assume(r != null, s"fixture $name missing")
    r.getPath
  }

  test("parseViews: names, column lists, quoting, embedded-statement strings") {
    val defs = SqlDump.parseViews(
      """CREATE TABLE t (x INTEGER);
        |CREATE VIEW v1 AS SELECT x FROM t WHERE note <> 'CREATE VIEW nope AS SELECT 1';
        |CREATE VIEW IF NOT EXISTS "v two" (a, b) AS SELECT x, x+1 FROM t;
        |CREATE TEMP VIEW main.v3 AS SELECT 'semi;colon' AS s;
        |INSERT INTO t VALUES (1);""".stripMargin)
    assert(defs.map(_.name) === Seq("v1", "v two", "v3"))
    assert(defs(0).cols.isEmpty &&
      defs(0).body === "SELECT x FROM t WHERE note <> 'CREATE VIEW nope AS SELECT 1'")
    assert(defs(1).cols === Seq("a", "b"))
    assert(defs(2).body === "SELECT 'semi;colon' AS s")
    // a string containing CREATE VIEW must not yield a phantom view
    assert(SqlDump.parseViews(
      "INSERT INTO t VALUES ('CREATE VIEW fake AS SELECT 1');").isEmpty)
  }

  test("file-defined views: listed, queryable, columns served, tables-only item access") {
    for (fixture <- Seq("sqlite_views.db", "sqlite_views.sql")) {
      val db = Database.open(spark, res(fixture))
      assert(db.tables === Seq("people"), s"in $fixture")
      assert(db.views.sorted === Seq("adults", "city_counts", "v_cols"),
        s"in $fixture")
      // get_columns accepts views (reference connection.py:157), including
      // the explicit output-column list renames
      assert(db.getColumns("v_cols") === Seq("pid", "pname"), s"in $fixture")
      assert(db.getColumns("adults") === Seq("id", "name", "age"), s"in $fixture")
      // view bodies run through the full SQL surface, view-on-view included
      assert(db.query("SELECT pname FROM v_cols ORDER BY pid")
        .collect().map(_.getString(0)).toSeq ===
        Seq("ann", "cat", "dan", "eve; CREATE VIEW fake AS SELECT 1"),
        s"in $fixture")
      assert(db.query("SELECT n FROM city_counts WHERE city = 'oslo'")
        .collect().map(_.getLong(0)).toSeq === Seq(3L), s"in $fixture")
      // db[...] hands out Table handles for TABLES only, like the
      // reference's __getitem__ (views raise)
      intercept[InvalidTableError] { db("adults") }
      intercept[InvalidTableError] { db.getColumns("no_such") }
      // exit drops the file views with the rest of the session state
      db.exit()
      assert(!spark.catalog.tableExists("adults"), s"in $fixture")
      assert(!spark.catalog.tableExists("v_cols"), s"in $fixture")
    }
  }

  test("both readers surface the same view definitions") {
    val fromDb = SqliteFile.views(res("sqlite_views.db"))
    val fromSql = SqlDump.viewDefs(spark, res("sqlite_views.sql"))
    assert(fromDb.map(v => (v.name, v.cols, v.body)).toSet ===
      fromSql.map(v => (v.name, v.cols, v.body)).toSet)
    assert(fromDb.map(_.name).sorted === Seq("adults", "city_counts", "v_cols"))
  }

  test("a view that cannot resolve fails loud, not silently dropped") {
    import graft.api.FileTypeError
    val e = intercept[FileTypeError] {
      Database.registerFileViews(spark, Set("t"),
        Seq(SqlDump.ViewDef("vbad", Nil, "SELECT * FROM no_such_table_xyz")))
    }
    assert(e.getMessage.contains("vbad"))
    // and a view shadowing a table is rejected outright
    val e2 = intercept[FileTypeError] {
      Database.registerFileViews(spark, Set("t"),
        Seq(SqlDump.ViewDef("t", Nil, "SELECT 1")))
    }
    assert(e2.getMessage.contains("collides"))
  }
}
