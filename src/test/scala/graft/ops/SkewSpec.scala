package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewSpec extends SparkSuite {

  test("saltedJoin equals the plain join on a skewed fact") {
    import spark.implicits._
    // 90% of the fact sits on one hot key — the shape salting exists for
    val fact = ((1 to 900).map(i => (i.toLong, "hot")) ++
      (901 to 1000).map(i => (i.toLong, s"k${i % 7}")))
      .toDF("id", "key").repartition(8)
    val dim = fact.select("key").distinct()
      .withColumn("tag", concat(lit("d_"), col("key")))
    val salted = Skew.saltedJoin(fact, dim, "key", salt = 4)
      .select("id", "key", "tag")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val plain = fact.join(dim, "key")
      .select("id", "key", "tag")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(salted == plain && salted.size == 1000)
  }

  test("the hot key's rows actually spread across multiple sub-keys") {
    import spark.implicits._
    val fact = (1 to 400).map(i => (i.toLong, "hot")).toDF("id", "key")
      .repartition(8)
    val salts = fact.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(4L)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts >= 3, s"expected the hot key spread over >=3 of 4 sub-keys, got $salts")
  }

  test("saltedJoin rejects a salt that cannot spread") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "key")
    intercept[IllegalArgumentException](Skew.saltedJoin(df, df, "key", 1))
  }
}
