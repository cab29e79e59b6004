package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DiffSpec extends SparkSuite {

  import spark.implicits._

  private def diffMap(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame) =
    Diff.keyed(a, b, Seq("id"), Seq("v", "w")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("identical frames diff to empty, regardless of order and partitioning") {
    val a = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, null.asInstanceOf[String], 30L))
      .toDF("id", "v", "w")
    val b = a.orderBy(desc("id")).repartition(7)
    assert(diffMap(a, b).isEmpty)
  }

  test("added / removed / changed classified per key") {
    val a = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L)).toDF("id", "v", "w")
    val b = Seq((1L, "x", 10L), (2L, "y", 21L), (4L, "q", 40L)).toDF("id", "v", "w")
    assert(diffMap(a, b) == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("multiset semantics: duplicate keys compare by count AND content") {
    val a = Seq((1L, "x", 1L), (1L, "x", 1L), (2L, "y", 2L)).toDF("id", "v", "w")
    val sameDup = Seq((1L, "x", 1L), (1L, "x", 1L), (2L, "y", 2L)).toDF("id", "v", "w")
    assert(diffMap(a, sameDup).isEmpty)
    val fewer = Seq((1L, "x", 1L), (2L, "y", 2L)).toDF("id", "v", "w")
    assert(diffMap(a, fewer) == Map(1L -> "changed"))
    val swapped = Seq((1L, "x", 1L), (1L, "x", 2L), (2L, "y", 2L)).toDF("id", "v", "w")
    assert(diffMap(a, swapped) == Map(1L -> "changed"))
  }

  test("NULL never collides with any literal rendering") {
    // 'n' is the absence marker in the canonical rendering; a real value
    // "n" must still differ from NULL
    val a = Seq((1L, null.asInstanceOf[String], 1L)).toDF("id", "v", "w")
    val b = Seq((1L, "n", 1L)).toDF("id", "v", "w")
    assert(diffMap(a, b) == Map(1L -> "changed"))
    // and column-boundary shifts change the hash (prefix discipline)
    val c = Seq((1L, "ab", 1L)).toDF("id", "v", "w")
    val d = Seq((1L, "a", 1L)).toDF("id", "v", "w")
    assert(diffMap(c, d) == Map(1L -> "changed"))
  }

  test("NULL keys are addressable keys: identical NULL-key rows diff to empty") {
    val a = Seq((Some(1L), "x", 1L), (None, "z", 9L)).toDF("id", "v", "w")
    val b = Seq((Some(1L), "x", 1L), (None, "z", 9L)).toDF("id", "v", "w")
    assert(Diff.keyed(a, b, Seq("id"), Seq("v", "w")).count() == 0L)
    // and a CHANGED null-key row reports once as changed — not added+removed
    val c = Seq((Some(1L), "x", 1L), (None, "z", 10L)).toDF("id", "v", "w")
    val rows = Diff.keyed(a, c, Seq("id"), Seq("v", "w")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1))
    assert(rows.toSeq == Seq(None -> "changed"))
  }

  test("value-column order is part of the canonical form") {
    val a = Seq((1L, "x", "y")).toDF("id", "v", "w")
    val b = Seq((1L, "y", "x")).toDF("id", "v", "w")
    assert(Diff.keyed(a, b, Seq("id"), Seq("v", "w")).count() == 1L)
  }
}
