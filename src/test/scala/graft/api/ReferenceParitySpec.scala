package graft.api

import graft.SparkSuite

/** Golden-value parity against the reference's OWN primary fixture
  * (forestation.db, converted to parquet under src/test/resources): the
  * values its tests and README assert are reproduced by this engine.
  * Sources: reference tests/test_table.py:243-250, README.md:224-248.
  */
class ReferenceParitySpec extends SparkSuite {

  private val dir = getClass.getResource("/forestation").getPath
  lazy val db: Database = Database.open(spark, dir)

  test("catalog matches the reference fixture") {
    assert(db.tables == Seq("forest_area", "land_area", "regions"))
    assert(db("forest_area").len == 5886)
    assert(db("land_area").len == 5886)
    assert(db("regions").len == 219)
  }

  test("filter golden values (tests/test_table.py:243-250)") {
    val r = db("regions")
    val low = r.filter(r("income_group") === "Low income")
    assert(low.len == 34)
    val lowSsa = low.filter(low("region") === "Sub-Saharan Africa")
    assert(lowSsa.len == 27)
    // combined-expression equivalence (tests/test_table.py:258-262)
    val combined = r.filter(
      (r("income_group") === "Low income") && (r("region") === "Sub-Saharan Africa"))
    assert(combined.len == 27)
  }

  test("text describe golden values (README.md:224-236)") {
    val d = db("forest_area").col("country_name").describe
    assert(d("len") == 5886L)
    assert(d("count") == 5886L)
    assert(d("unique") == 218)
    assert(d("min") == "Afghanistan")
    assert(d("max") == "Zimbabwe")
  }

  test("numeric describe golden values (README.md:238-248)") {
    val c = db("forest_area").col("forest_area_sqkm")
    val d = c.describe
    assert(d("len") == 5886L)
    assert(d("count") == 5570L)
    assert(math.abs(d("min").asInstanceOf[Double] - 0.799999982) < 1e-9)
    assert(math.abs(d("max").asInstanceOf[Double] - 41282694.9) < 1e-6)
    assert(math.abs(d("sum").asInstanceOf[Double] - 2178158753.6738772) < 1e-3)
    assert(math.abs(d("avg").asInstanceOf[Double] - 391051.84087502287) < 1e-6)
    assert(math.abs(d("median").asInstanceOf[Double] - 20513.00049) < 1e-4)
  }

  test("null accounting on real nullable data") {
    val c = db("forest_area").col("forest_area_sqkm")
    assert(c.nullCount == 5886L - 5570L)
    assert(c.len == c.count + c.nullCount)
  }
}
