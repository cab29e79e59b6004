package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: the distributed union+LOCF as-of join must equal a
  * driver-side brute force (per left row: max-time right row with the same
  * composite key and time <= left time) on RANDOM data — including
  * duplicate timestamps, keys with no matches, and multi-column keys.
  */
object AsofProperties extends Properties("graft.ops.AsofJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rowsGen: Gen[(Seq[(Long, Long, Long, Long)], Seq[(Long, Long, Long, Double)])] =
    for {
      nl <- Gen.choose(1, 40)
      nr <- Gen.choose(0, 40)
      // small key/time domains force collisions: equal timestamps, shared
      // (k1, k2) groups, and left keys with no right rows at all
      lefts <- Gen.listOfN(nl, for {
        k1 <- Gen.choose(0L, 2L); k2 <- Gen.choose(0L, 1L)
        t <- Gen.choose(0L, 20L)
      } yield (k1, k2, t, 0L))
      rights <- Gen.listOfN(nr, for {
        k1 <- Gen.choose(0L, 2L); k2 <- Gen.choose(0L, 1L)
        t <- Gen.choose(0L, 20L); v <- Gen.choose(1, 999)
      } yield (k1, k2, t, v.toDouble))
    } yield (lefts.zipWithIndex.map { case ((a, b, c, _), i) => (a, b, c, i.toLong) },
      rights)

  property("asofKeys equals driver-side brute force on random data") =
    forAll(rowsGen) { case (lefts, rights) =>
      import spark.implicits._
      val ldf = lefts.toDF("k1", "k2", "t", "lid")
      val rdf = rights.toDF("k1", "k2", "t", "v")

      val got = AsofJoin.asofKeys(ldf, rdf, Seq("k1", "k2"), "t", "t", Seq("v"))
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap

      val want = lefts.map { case (k1, k2, t, lid) =>
        val matches = rights.filter(r => r._1 == k1 && r._2 == k2 && r._3 <= t)
        // the engine's documented tiebreak: at equal max time, the largest
        // payload wins (deterministic across runs)
        lid -> (if (matches.isEmpty) None else {
          val tmax = matches.map(_._3).max
          Some(matches.filter(_._3 == tmax).map(_._4).max)
        })
      }.toMap

      got == want
    }
}
