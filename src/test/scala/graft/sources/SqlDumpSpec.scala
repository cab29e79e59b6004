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
