package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Round-trip property for the dump parser: any row serialized the way
  * sqlite3/pg_dump write INSERT statements (single quotes doubled, bare
  * NULLs) parses back to exactly the original values — including quotes,
  * commas, parens, and the literal string "NULL".
  */
object SqlDumpProperties extends Properties("SqlDump") {

  private val cell: Gen[Option[String]] = Gen.frequency(
    3 -> Gen.alphaNumStr.map(Some(_)),
    2 -> Gen.listOf(Gen.oneOf("'", ",", "(", ")", " ", "a", "O'Brien", "NULL", "\t"))
      .map(l => Some(l.mkString)),
    1 -> Gen.const(None),
    1 -> Gen.const(Some("NULL")), // quoted 'NULL' string is NOT null
    1 -> Gen.chooseNum(-1000000L, 1000000L).map(n => Some(n.toString)))

  private def quote(v: Option[String]): String =
    v.map(s => "'" + s.replace("'", "''") + "'").getOrElse("NULL")

  property("parseValues round-trips serialized rows") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.nonEmptyListOf(cell).map(_.take(8)))) { rowsRaw =>
      val arity = rowsRaw.head.size
      val rows = rowsRaw.map(r => r.padTo(arity, Option("x")).take(arity))
      val stmt = "INSERT INTO t VALUES " +
        rows.map(_.map(quote).mkString("(", ",", ")")).mkString(",") + ";"
      val parsed = SqlDump.parseValues(stmt, arity)
      parsed == rows.map(_.map(_.orNull))
    }

  property("numeric cells survive unquoted (the dump's actual number form)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1e6.toLong, 1e6.toLong))) { ns =>
      val stmt = s"INSERT INTO t VALUES ${ns.mkString("(", ",", ")")};"
      SqlDump.parseValues(stmt, ns.size) == Seq(ns.map(_.toString))
    }

  // ---- CREATE VIEW scanner round-trip ----------------------------------

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(10).mkString)

  /** A literal string payload designed to break naive scanners: embedded
    * quotes (doubled on render), semicolons, and the text CREATE VIEW.
    */
  private val nastyLit: Gen[String] = Gen.listOf(Gen.oneOf(
    "'", ";", "CREATE VIEW x AS SELECT 1", "--", "(", ")", "a", " "))
    .map(_.take(6).mkString)

  private case class RenderedView(name: String, cols: Seq[String],
      body: String, text: String)

  private val viewGen: Gen[RenderedView] = for {
    name <- ident
    quoteName <- Gen.oneOf(true, false)
    ifNotExists <- Gen.oneOf(true, false)
    temp <- Gen.oneOf("", "TEMP ", "TEMPORARY ")
    cols <- Gen.oneOf(Gen.const(Seq.empty[String]),
      Gen.nonEmptyListOf(ident).map(_.take(4).distinct))
    lit <- nastyLit
  } yield {
    val body = s"SELECT '${lit.replace("'", "''")}' AS c FROM t"
    val n = if (quoteName) "\"" + name + "\"" else name
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    val cl = if (cols.isEmpty) "" else cols.mkString(" (", ", ", ")")
    RenderedView(name, cols, body, s"CREATE ${temp}VIEW $ine$n$cl AS $body;")
  }

  property("parseViews round-trips rendered CREATE VIEW statements") =
    Prop.forAll(Gen.nonEmptyListOf(viewGen).map(_.take(5))) { vs =>
      // interleave table DDL and INSERT noise between the views, the way
      // a real dump looks
      val text = vs.map(v =>
        s"CREATE TABLE t (x INTEGER);\n${v.text}\n" +
          "INSERT INTO t VALUES ('CREATE VIEW no AS SELECT 1');")
        .mkString("\n")
      val parsed = SqlDump.parseViews(text)
      parsed.map(_.name) == vs.map(_.name) &&
        parsed.map(_.cols) == vs.map(_.cols) &&
        parsed.map(_.body) == vs.map(_.body)
    }
}
