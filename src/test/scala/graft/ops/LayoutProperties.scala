package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests for the versioned-store invariants on RANDOM batch
  * splits: however a corpus is sliced into batches, (a) the union of the
  * store equals the corpus, (b) readSince(k) equals exactly the batches
  * ≥ k, and (c) a consumer that read-then-committed sees each row exactly
  * once across any commit schedule — the at-least-once contract's
  * "no row skipped, no row re-delivered after commit" core.
  */
object LayoutProperties extends Properties("graft.ops.Layout") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Random corpus (id, part, payload) plus a random partition of its ids
    * into 1-4 ordered batches.
    */
  private val corpusGen: Gen[(Seq[(Long, String, Long)], Seq[Seq[Long]])] = for {
    n <- Gen.choose(6, 30)
    parts <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    nBatches <- Gen.choose(1, 4)
    cutTail <- Gen.listOfN(n - 1, Gen.choose(0, nBatches - 1))
  } yield {
    // first row pinned to batch 0 so the store exists (with a schema)
    // before the first consumer read — an empty parquet dir has no schema
    // to infer, which is a real constraint, not a test artifact
    val cut = 0 :: cutTail
    val rows = parts.zipWithIndex.map { case (p, i) => (i.toLong, p, i * 7L) }
    val batches = (0 until nBatches).map(b =>
      rows.zip(cut).collect { case (r, c) if c == b => r._1 })
    (rows, batches)
  }

  property("readSince(k) = batches >= k; full read = corpus; readNew sees each row once") =
    forAll(corpusGen) { case (rows, batches) =>
      val sp = spark
      import sp.implicits._
      val dir = java.nio.file.Files.createTempDirectory("layout_prop_")
        .resolve("store").toString
      val df = rows.toDF("id", "part", "payload")
      // interleave producer and consumer: after EVERY append the consumer
      // reads its fresh slice and commits — the live pipeline shape
      var expected = Map.empty[Long, Long] // id -> assigned batch
      var nextBatch = 0L
      var seen = Set.empty[Long]
      var disjoint = true
      batches.foreach { ids =>
        val batchDf = df.filter($"id".isin(ids: _*))
        Layout.appendBatch(batchDf, dir, "part", Seq("id"))
        // empty batches write no ingest_batch dir → no id advances
        if (ids.nonEmpty) {
          expected ++= ids.map(_ -> nextBatch)
          nextBatch += 1
        }
        val (fresh, upTo) = Layout.readNew(spark, dir, "prop")
        val got = fresh.select("id").collect().map(_.getLong(0)).toSet
        if ((seen & got).nonEmpty) disjoint = false
        seen ++= got
        Layout.commitCheckpoint(dir, "prop", upTo)
      }
      val consumeOk = disjoint && seen == expected.keySet
      val all = spark.read.parquet(dir)
        .select("id", "ingest_batch").collect()
        .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
      val fullOk = all == expected
      val sinceOk = (0L until nextBatch).forall { k =>
        val got = Layout.readSince(spark, dir, k)
          .select("id").collect().map(_.getLong(0)).toSet
        got == expected.collect { case (id, b) if b >= k => id }.toSet
      }
      fullOk && sinceOk && consumeOk
    }
}
