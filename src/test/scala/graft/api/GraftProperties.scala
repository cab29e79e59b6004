package graft.api

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck metamorphic invariants (reference test pattern 3,
  * SURVEY.md §5): partition-of-unity filters, filter composition,
  * exact-n sampling, limit monotonicity, positional consistency.
  */
object GraftProperties extends Properties("graft.api") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val db = Database.open(spark, "/root/testdata/sf0.001")
  private lazy val li = db("lineitem")
  private lazy val total = li.len
  private lazy val quantities =
    li.toDf.select("l_quantity").collect().map(_.getDouble(0)).sorted

  property("filter partition-of-unity: >=x and <x cover the table") =
    forAll(Gen.choose(0.0, 60.0)) { x =>
      li.filter(li("l_quantity") >= x).len +
        li.filter(li("l_quantity") < x).len == total
    }

  property("chained filters == conjunction") =
    forAll(Gen.choose(0.0, 60.0), Gen.choose(0.0, 0.2)) { (q, d) =>
      val chained = li.filter(li("l_quantity") >= q)
      val both = chained.filter(chained("l_discount") <= d).len
      li.filter((li("l_quantity") >= q) && (li("l_discount") <= d)).len == both
    }

  property("filtered count equals driver-side oracle") =
    forAll(Gen.choose(0.0, 60.0)) { x =>
      li.filter(li("l_quantity") >= x).len ==
        quantities.count(_ >= x).toLong
    }

  property("sample(n) returns exactly n rows") =
    forAll(Gen.choose(1, 200), Gen.choose(Long.MinValue, Long.MaxValue)) { (n, seed) =>
      li.sample(n, seed).toDf.count() == n.toLong
    }

  property("limit(n).len == min(n, len)") =
    forAll(Gen.choose(0, 10000)) { n =>
      li.limit(n).len == math.min(n.toLong, total)
    }

  property("between(a,b) == >=a && <=b") =
    forAll(Gen.choose(0.0, 30.0), Gen.choose(30.0, 60.0)) { (a, b) =>
      li.filter(li("l_quantity").between(a, b)).len ==
        li.filter((li("l_quantity") >= a) && (li("l_quantity") <= b)).len
    }

  property("iloc(i) matches the i-th row of the materialized head") = {
    val head = li.limit(50).toDf.collect()
    forAll(Gen.choose(0, 49)) { i =>
      li.iloc(i.toLong).toSeq == head(i).toSeq
    }
  }
}
