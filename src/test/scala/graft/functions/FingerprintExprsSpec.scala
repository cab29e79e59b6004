package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.FingerprintExprs.{minhashSig, simhash64}

/** The fused fingerprint expressions must be value-equal to the relational
  * formulations they replace (explode+groupBy SimHash, HOF-chain MinHash),
  * and reachable from pure SQL via GraftExtensions.
  */
class FingerprintExprsSpec extends SparkSuite {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("simhash64 equals the explode/groupBy bit-sum formulation, with no shuffle") {
    val relational = {
      val tok = docs
        .select(col("doc_id"),
          explode(array_distinct(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))).as("t"))
        .withColumn("__h", xxhash64(col("t")))
      val bitSums = (0 until 64).map(b =>
        sum(shiftrightunsigned(col("__h"), b).bitwiseAND(1) * 2 - 1).as(s"b$b"))
      tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(b =>
            when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
            .reduce(_ bitwiseOR _).as("ref"))
    }
    val fused = graft.ops.Dedup.simhash64(docs, "doc_id", "text")
    val joined = fused.join(relational, "doc_id")
    assert(joined.count() == relational.count() && joined.count() == fused.count(),
      "both forms must fingerprint the same set of docs")
    assert(joined.count() > 0)
    assert(joined.filter(col("simhash") =!= col("ref")).count() == 0)

    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fused simhash must be map-only:\n$plan")
  }

  test("simhash64/minhash_sig follow the \\s charset on unicode whitespace") {
    import spark.implicits._
    // U+2028 is Character.isWhitespace but NOT regex \s: the fused
    // expressions must keep "a b" one token, like the relational \S+
    // forms the equivalence specs compare against
    val df = Seq((1L, "a b c d e"), (2L, "x  y z w")).toDF("doc_id", "text")
    val relSim = {
      val tok = df.select(col("doc_id"),
          explode(array_distinct(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))).as("t"))
        .withColumn("__h", xxhash64(col("t")))
      val bitSums = (0 until 64).map(b =>
        sum(shiftrightunsigned(col("__h"), b).bitwiseAND(1) * 2 - 1).as(s"b$b"))
      tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(b =>
            when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
            .reduce(_ bitwiseOR _).as("ref"))
    }
    val fused = df.select(col("doc_id"), simhash64(col("text")).as("simhash"))
    assert(fused.join(relSim, "doc_id")
      .filter(col("simhash") =!= col("ref")).count() == 0)
    val hof = df.select(col("doc_id"),
      transform(sequence(lit(0), lit(15)),
        i => array_min(transform(
          graft.functions.ShingleExpr.wordShingles(col("text"), 3),
          x => xxhash64(i, x)))).as("ref"))
    val sig = df.select(col("doc_id"), minhashSig(col("text"), 3, 16).as("sg"))
    assert(sig.join(hof, "doc_id").filter(!(col("sg") <=> col("ref"))).count() == 0)
  }

  test("minhash_sig equals the transform/array_min HOF chain") {
    val hof = graft.ops.Dedup.shingled(docs, "doc_id", "text", 3)
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(15)),
          i => array_min(transform(col("sh"), x => xxhash64(i, x)))).as("ref"))
    val fused = docs.select(col("doc_id"), minhashSig(col("text"), 3, 16).as("sg"))
      .filter(element_at(col("sg"), 1).isNotNull)
    val joined = fused.join(hof, "doc_id")
    assert(joined.count() == hof.count())
    assert(joined.filter(not(col("sg") <=> col("ref"))).count() == 0)
  }

  test("minhash_sig edge cases: short text yields null slots, null stays null") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, "a b c d"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val rows = df.select(col("id"), minhashSig(col("text"), 3, 4).as("sg"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Any](1) == Seq(null, null, null, null)) // < n tokens
    assert(rows(1).getSeq[Any](1).forall(_ != null))
    assert(rows(2).isNullAt(1))
  }

  test("simhash64 / minhash_sig / lsh_signatures are callable from SQL") {
    graft.GraftExtensions.register(spark)
    docs.limit(50).createOrReplaceTempView("__fp_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash64(text) AS sh, minhash_sig(text, 3, 16) AS sg FROM __fp_docs")
    val viaCol = docs.limit(50).select(col("doc_id"), simhash64(col("text")).as("sh"),
      minhashSig(col("text"), 3, 16).as("sg"))
    assert(viaSql.exceptAll(viaCol).count() == 0 && viaCol.exceptAll(viaSql).count() == 0)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.selectExpr("size(embedding) AS d").head().getInt(0)
    emb.limit(20).createOrReplaceTempView("__fp_emb")
    val sqlSigs = spark.sql(
      s"SELECT vec_id, lsh_signatures(embedding, $dim, 42, 4, 8) AS sig FROM __fp_emb")
    val planes = graft.ops.Similarity.hyperplanes(42L, 4, 8, dim)
    val scalaSigs = emb.limit(20).select(col("vec_id"),
      graft.functions.VectorExprs.lshSignatures(col("embedding"), planes).as("sig"))
    assert(sqlSigs.exceptAll(scalaSigs).count() == 0)
  }
}
