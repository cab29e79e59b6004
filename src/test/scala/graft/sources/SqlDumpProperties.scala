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
}
