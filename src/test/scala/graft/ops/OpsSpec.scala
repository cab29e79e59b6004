package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Library-level specs for the training-data-pipeline operators. */
class OpsSpec extends SparkSuite {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Brute-force word-3-gram Jaccard for a small corpus, driver-side. */
  private def bruteJaccard(limit: Int): Map[(Long, Long), Double] = {
    val sets = docs.filter(col("doc_id") < limit)
      .select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).split("\\s+").filter(_.nonEmpty)
        val sh = w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
        r.getLong(0) -> sh
      }.toMap
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      if inter > 0
    } yield (a, b) -> inter.toDouble / (sa.size + sb.size - inter)).toMap
  }

  test("Dedup.exact keeps lowest id per duplicate group") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "x"), (5L, "z"))
      .toDF("id", "t")
    val out = Dedup.exact(df, "id", Seq("t")).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L))
  }

  test("Dedup.ngramJaccardPairs matches brute force exactly") {
    val brute = bruteJaccard(200).filter(_._2 >= 0.8)
    val got = Dedup.ngramJaccardPairs(
        docs.filter(col("doc_id") < 200), "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == brute.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - brute(k)) < 1e-12) }
    assert(got.nonEmpty) // fixture contains near-dups
  }

  test("Dedup.ngramJaccardPairs dfCap is conservative (subset of exact)") {
    import spark.implicits._
    // 40 docs all sharing one hot prefix shingle; docs 0/1 and 2/3 are
    // near-dup pairs whose similarity survives without the hot shingle
    val hot = "alpha beta gamma"
    val df = (0 until 40).map { i =>
      val body = i match {
        case 0 | 1 => "one two three four five six seven eight nine ten"
        case 2 | 3 => "red orange yellow green blue indigo violet pink black white"
        case _     => s"unique$i filler$i words$i more$i stuff$i here$i now$i then$i"
      }
      (i.toLong, s"$hot $body")
    }.toDF("doc_id", "text")
    def pairs(cap: Long) =
      Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.6, dfCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(0L)
    val capped = pairs(5L) // every doc holds the hot shingles -> df=40 > 5
    assert(exact.contains((0L, 1L)) && exact.contains((2L, 3L)))
    assert(capped.subsetOf(exact))
    assert(capped.contains((0L, 1L)) && capped.contains((2L, 3L)))
  }

  test("Dedup.containmentPairs dfCap is conservative (subset of exact)") {
    import spark.implicits._
    // every doc shares one hot boilerplate span (its fingerprints reach
    // df = 40); docs 0/1 and 2/3 additionally share long private spans
    // whose fingerprints survive the cap
    val hot = "alpha beta gamma delta epsilon zeta eta theta"
    val df = (0 until 40).map { i =>
      val body = i match {
        case 0 | 1 => "one two three four five six seven eight nine ten eleven twelve"
        case 2 | 3 => "red orange yellow green blue indigo violet pink black white grey brown"
        case _     => s"unique$i filler$i words$i more$i stuff$i here$i now$i then$i extra$i end$i"
      }
      (i.toLong, s"$hot $body")
    }.toDF("doc_id", "text")
    def pairs(cap: Long) =
      Dedup.containmentPairs(df, "doc_id", "text", dfCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(0L)
    val capped = pairs(5L) // boilerplate fingerprints have df = 40 > 5
    assert(exact.contains((0L, 1L)) && exact.contains((2L, 3L)))
    assert(capped.subsetOf(exact))
    assert(capped.contains((0L, 1L)) && capped.contains((2L, 3L)))
    // a cap above every fingerprint's df changes nothing
    assert(pairs(1000L) == exact)
  }

  test("Dedup.minhashLshPairs recalls all very-high-jaccard pairs") {
    val brute = bruteJaccard(200)
    val high = brute.filter(_._2 >= 0.95).keySet
    val cand = Dedup.minhashLshPairs(
        docs.filter(col("doc_id") < 200), "doc_id", "text", k = 32, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(high.nonEmpty)
    // 8 bands x 4 rows: P(miss) = (1-j^4)^8 = 1.5e-5 at j=0.95
    assert(high.subsetOf(cand))
    // and LSH candidates should not explode: bounded fan-out
    assert(cand.size < 2000)
  }

  test("Dedup.simhash64 + simhashNearPairs find perturbed near-dups") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again until done"
    val df = Seq(
      (1L, base),
      (2L, base),                       // exact dup -> hamming 0
      (3L, base + " extra"),            // tiny perturbation -> small hamming
      (4L, "completely different words describing spark catalyst optimizer internals plan")
    ).toDF("id", "text")
    val sim = Dedup.simhash64(df, "id", "text")
    val fp = sim.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) <= 8)
    assert(ham(fp(1L), fp(4L)) > 8)
    val pairs = Dedup.simhashNearPairs(sim, "id", maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.contains((1L, 4L)))
  }

  test("Similarity.bruteTopK is exact; lshTopK returns true cosines with recall") {
    val queries = emb.filter(col("vec_id") < 5)
      .withColumnRenamed("vec_id", "qid").select("qid", "embedding")
    val corpus = emb.filter(col("vec_id") >= 5).select("vec_id", "embedding")

    val brute = Similarity.bruteTopK(corpus, queries, "vec_id", "qid", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(brute.count(_._1._1 == 0L) == 10)

    val lsh = Similarity.lshTopK(corpus, queries, "vec_id", "qid", "embedding", 10,
      tables = 16, bits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // cosines reported by LSH are the true cosines (exact re-rank)
    lsh.foreach { case (k, v) =>
      brute.get(k).foreach(bv => assert(math.abs(v - bv) < 1e-12))
    }
    // recall@10 over 5 queries on uniform random vectors with 16x6-bit tables
    val recall = lsh.keySet.intersect(brute.keySet).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("semanticDedup: star grouping over confirmed LSH candidates") {
    val corpus = emb.select("vec_id", "embedding")
    // coarse buckets (1 bit × 8 tables) → near-exhaustive candidate recall
    val dups = Similarity.semanticDedup(corpus, "vec_id", "embedding",
        threshold = 0.40, tables = 8, bits = 1, seed = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(dups.nonEmpty)
    // every duplicate points at a strictly smaller representative with a
    // confirmed cosine; a doc appears at most once as a duplicate
    assert(dups.forall { case (id, rep, cos) => rep < id && cos >= 0.40 })
    assert(dups.map(_._1).distinct.length == dups.length)
    // confirmed pairs are TRUE cosines: spot-check against the exact value
    val exact = Similarity.thresholdPairs(corpus, "vec_id", "embedding", 0.40)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    dups.foreach { case (id, rep, cos) =>
      assert(math.abs(exact((rep, id)) - cos) < 1e-12)
    }
  }

  test("semanticDedupByCell: within-cell star grouping; nCells=1 is exhaustive") {
    val corpus = emb.select("vec_id", "embedding")
    // exhaustive: one cell == exact all-pairs star grouping
    val one = Similarity.semanticDedupByCell(
        Similarity.ivfIndex(corpus, "vec_id", "embedding", nCells = 1, seed = 5L),
        "vec_id", threshold = 0.40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = Similarity.thresholdPairs(corpus, "vec_id", "embedding", 0.40)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = exactPairs.groupBy(_._2).map { case (b, ps) => (b, ps.map(_._1).min) }.toSet
    assert(one == expect && one.nonEmpty)
    // partitioned: a valid subset (cell boundaries may drop pairs, never invent)
    val part = Similarity.semanticDedupByCell(
        Similarity.ivfIndex(corpus, "vec_id", "embedding", nCells = 4, seed = 5L),
        "vec_id", threshold = 0.40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exactMap = exactPairs.map { case (a, b) => (a, b) }.toSet
    assert(part.forall { case (id, rep, cos) => rep < id && cos >= 0.40 &&
      exactMap.contains((rep, id)) })
  }

  test("semanticDedupByCell: measured recall floor at production nCells (4 and 8)") {
    // the production path gates correctness at nCells=1 (exhaustive ==
    // oracle); this measures what the cell-boundary recall trade actually
    // COSTS at production partitioning, mirroring the ivfTopK pattern.
    // Recall = fraction of the exhaustive duplicate set still flagged
    // (rep assignment may legitimately differ when boundary pairs drop).
    val corpus = emb.select("vec_id", "embedding")
    val exhaustive = Similarity.semanticDedupByCell(
        Similarity.ivfIndex(corpus, "vec_id", "embedding", nCells = 1, seed = 5L),
        "vec_id", threshold = 0.40)
      .collect().map(_.getLong(0)).toSet
    assert(exhaustive.nonEmpty)
    val recalls = Seq(4, 8).map { n =>
      val got = Similarity.semanticDedupByCell(
          Similarity.ivfIndex(corpus, "vec_id", "embedding", nCells = n, seed = 5L),
          "vec_id", threshold = 0.40)
        .collect().map(_.getLong(0)).toSet
      assert(got.subsetOf(exhaustive)) // cells drop pairs, never invent them
      n -> got.intersect(exhaustive).size.toDouble / exhaustive.size
    }.toMap
    info(s"semdedup-by-cell recall vs exhaustive: $recalls")
    assert(recalls(4) >= 0.5, s"nCells=4 recall=${recalls(4)}")
    assert(recalls(8) >= 0.3, s"nCells=8 recall=${recalls(8)}")
  }

  test("thresholdPairs guard refuses a corpus above maxRows, directing to LSH") {
    // under the cap: runs and finds exact pairs
    val small = emb.limit(20).select("vec_id", "embedding")
    assert(Similarity.thresholdPairs(small, "vec_id", "embedding", -1.0).count() ==
      20L * 19 / 2)
    // over the cap: refuses with a message naming the scale paths
    val err = intercept[IllegalArgumentException] {
      Similarity.thresholdPairs(emb, "vec_id", "embedding", 0.9, maxRows = 10L)
    }
    assert(err.getMessage.contains("lshTopK"), err.getMessage)
  }

  test("Similarity.ivfTopK: exhaustive probe equals brute force; partial probe recalls") {
    val queries = emb.filter(col("vec_id") < 3)
      .withColumnRenamed("vec_id", "qid").select("qid", "embedding")
    val corpus = emb.filter(col("vec_id") >= 3).select("vec_id", "embedding")
    val brute = Similarity.bruteTopK(corpus, queries, "vec_id", "qid", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // probing ALL cells is exhaustive -> identical result set
    val full = Similarity.ivfTopK(corpus, queries, "vec_id", "qid", "embedding", 5,
      nCells = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute)

    // partial probe: valid subset with reasonable recall
    val part = Similarity.ivfTopK(corpus, queries, "vec_id", "qid", "embedding", 5,
      nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = part.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("band index save/load: screening against the reloaded index == direct screen") {
    val corpus = docs.filter(col("doc_id") >= 100 && col("doc_id") < 300)
      .select("doc_id", "text")
    // guarantee at least one certain hit: a probe that IS a corpus doc
    val planted = corpus.filter(col("doc_id") === 100)
      .select((col("doc_id") + 999000L).as("doc_id"), col("text"))
    val probes = docs.filter(col("doc_id") < 100).select("doc_id", "text")
      .unionByName(planted)
    val dir = java.nio.file.Files.createTempDirectory("graftband").toString + "/idx"
    Dedup.saveBandIndex(corpus, "doc_id", "text", dir)
    // the stored recipe drives the probe hashing — no way to mismatch
    val viaIndex = Dedup.nearDupAgainstSavedIndex(probes, "doc_id", "text", spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = graft.streaming.DocStream.nearDupAgainstCorpus(probes, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex == direct && viaIndex.contains((999100L, 100L)))
  }

  test("IvfIndex save/load round-trip: probes against the reloaded index are identical") {
    val queries = emb.filter(col("vec_id") < 3)
      .withColumnRenamed("vec_id", "qid").select("qid", "embedding")
    val corpus = emb.filter(col("vec_id") >= 3).select("vec_id", "embedding")
    val built = Similarity.ivfIndex(corpus, "vec_id", "embedding", nCells = 8, seed = 11L)
    val dir = java.nio.file.Files.createTempDirectory("graftivf").toString + "/idx"
    Similarity.saveIvfIndex(built, dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    def probe(i: Similarity.IvfIndex) =
      Similarity.ivfTopK(i, queries, "vec_id", "qid", "embedding", k = 5, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(probe(loaded) == probe(built) && probe(built).nonEmpty)
  }

  test("minhashVerifiedPairs == exact ngram pairs (no false positives/negatives at high j)") {
    val exact = Dedup.ngramJaccardPairs(
        docs.filter(col("doc_id") < 200), "doc_id", "text", 3, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup.minhashVerifiedPairs(
        docs.filter(col("doc_id") < 200), "doc_id", "text", 3, 32, 8, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == exact) // P(LSH miss at j>=0.95 with 8x4 bands) ~ 1.5e-5
    assert(exact.nonEmpty)
  }

  test("containmentPairs finds embedded common substrings") {
    import spark.implicits._
    val core = "spark catalyst turns logical plans into physical plans with codegen"
    val df = Seq(
      (1L, s"intro text before. $core and some trailing words"),
      (2L, s"completely different framing here: $core"),
      (3L, "no overlap with anything else in this corpus at all today")
    ).toDF("id", "text")
    val pairs = Dedup.containmentPairs(df, "id", "text", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("Multimodal: binary payload plumbing + batched feature extraction") {
    val media = Multimodal.syntheticMediaTable(spark,
      docs.filter(col("doc_id") < 50), "doc_id", "text")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 50)
    val byId = feats.map(f => f.media_id -> f).toMap
    val nchars = docs.filter(col("doc_id") < 50)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId.foreach { case (id, f) =>
      assert(f.n_bytes == nchars(id)) // ascii text -> 1 byte per char
      assert(f.mean_intensity > 0.0 && f.mean_intensity <= 1.0)
      assert(f.frame_offsets.length == (f.n_bytes + 1023) / 1024)
    }
  }

  test("Reservoir.sampleK == window bottom-k-by-hash; merges partially; k caps strata") {
    import org.apache.spark.sql.expressions.Window
    val src = docs.select(col("lang"), col("doc_id"))
    val res = Reservoir.sampleK(src, "lang", "doc_id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // identical sample to the window formulation (same bottom-k-by-md5 set)
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val win = src.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(res == win && res.nonEmpty)
    // exactly min(k, |stratum|) per stratum
    val perLang = res.groupBy(_._1).map { case (l, s) => l -> s.size }
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == sizes.map { case (l, n) => l -> math.min(5L, n).toInt })
    // the aggregation is partial (map-side combine of bounded buffers),
    // not a full-row shuffle: two ObjectHashAggregate stages
    val plan = Reservoir.sampleK(src, "lang", "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("Reservoir.mergeK == sort-and-take over randomized bounded inputs") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { i =>
      val k = 1 + rnd.nextInt(8)
      def gen(): Seq[Reservoir.Cand] =
        Seq.fill(rnd.nextInt(12))(
          Reservoir.Cand(rnd.nextInt(6).toString, rnd.nextInt(50).toLong))
          .sortBy(c => (c.key, c.id)).take(k)
      val a = gen(); val b = gen()
      val got = Reservoir.mergeK(a, b, k)
      val exp = (a ++ b).sortBy(c => (c.key, c.id)).take(k)
      assert(got == exp, s"case $i: k=$k a=$a b=$b")
    }
  }

  test("Reservoir.weightedSampleK: deterministic A-ES, exact-k, weight-sensitive") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => ("s", i, if (i == 13L) 1e12 else 1.0)) ++
      (1L to 5L).map(i => ("t", 100L + i, i.toDouble))
    val df = rows.toDF("g", "id", "w").repartition(4)
    val got = Reservoir.weightedSampleK(df, "g", "id", "w", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // expected = the same A-ES formula computed driver-side
    def expect(stratum: Seq[(Long, Double)], k: Int): Set[Long] =
      stratum.map { case (id, w) =>
        id -> (-math.log(Reservoir.hashUniform(id)) / w)
      }.sortBy { case (id, p) => (p, id) }.take(k).map(_._1).toSet
    val exp = expect((1L to 40L).map(i => i -> (if (i == 13L) 1e12 else 1.0)), 3).map(("s", _)) ++
      expect((1L to 5L).map(i => (100L + i) -> i.toDouble), 3).map(("t", _))
    assert(got == exp)
    // the overwhelming weight is always drawn; strata cap at min(k, n)
    assert(got.contains(("s", 13L)))
    assert(got.count(_._1 == "t") == 3)
    // determinism across runs
    val again = Reservoir.weightedSampleK(df, "g", "id", "w", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == got)
    // zero/null weights are never drawn
    val withZero = Reservoir.weightedSampleK(
      (rows :+ (("t", 999L, 0.0))).toDF("g", "id", "w"), "g", "id", "w", 50)
      .collect().map(_.getLong(1)).toSet
    assert(!withZero.contains(999L))
  }

  /** In-memory PNG with every pixel set to gray level `v` (R=G=B=v). */
  private def grayPng(w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (v << 16) | (v << 8) | v
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("Multimodal: REAL javax.imageio decode through the mapPartitions path") {
    import spark.implicits._
    // gray level v -> BT.601 luma is exactly v/255 (r=g=b); declared
    // metadata dims are deliberately WRONG to prove the decoder reads the
    // actual image, not the metadata
    val rows = Seq(
      Multimodal.MediaRow(1L, grayPng(16, 8, 0), "png", 999, 999),
      Multimodal.MediaRow(2L, grayPng(10, 10, 255), "png", 999, 999),
      Multimodal.MediaRow(3L, grayPng(4, 6, 128), "png", 999, 999))
    val feats = Multimodal.extractFeatures(rows.toDS(), codec = Multimodal.ImageIoCodec)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).mean_intensity == 0.0)
    assert(feats(2L).mean_intensity == 1.0)
    assert(math.abs(feats(3L).mean_intensity - 128.0 / 255.0) < 1e-12)
    // decoded (not declared) dims, halved per the features contract
    assert(feats(1L).resized_w == 8 && feats(1L).resized_h == 4)
    assert(feats(2L).resized_w == 5 && feats(2L).resized_h == 5)
  }

  test("Multimodal: real resize re-encodes at target dims") {
    val resized = Multimodal.resizePng(grayPng(32, 16, 200), 8, 4)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth == 8 && img.getHeight == 4)
    // uniform-gray input stays (approximately) uniform gray through the
    // smooth scale; decode and check the mean via the real codec
    val (_, _, px) = Multimodal.ImageIoCodec.decode(resized, 8, 4)
    assert(math.abs(px.sum / px.length - 200.0 / 255.0) < 0.02)
  }

  test("Multimodal: ImageIoCodec fails loudly on undecodable bytes") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decode("not an image".getBytes, 4, 4)
    }
  }

  /** PNG with a horizontal gray gradient (left dark → right bright),
    * optionally perturbed at a handful of pixels.
    */
  private def gradientPng(w: Int, h: Int,
      perturb: Set[(Int, Int)] = Set.empty): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (perturb((x, y))) 255 else x * 255 / (w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("Multimodal: dHash — exact dups identical, pixel edits near, inversion far") {
    import spark.implicits._
    val base = gradientPng(32, 32)
    val copy = gradientPng(32, 32)
    val nearDup = gradientPng(32, 32, perturb = Set((5, 5), (20, 11)))
    // vertical inversion of the gradient direction: every row-gradient
    // bit flips
    val inverted = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = (31 - x) * 255 / 31
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, base, "png", 32, 32),
      Multimodal.MediaRow(2L, copy, "png", 32, 32),
      Multimodal.MediaRow(3L, nearDup, "png", 32, 32),
      Multimodal.MediaRow(4L, inverted, "png", 32, 32))
    val hs = Multimodal.dHash(rows.toDS(), Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def dist(a: Long, b: Long): Int =
      Multimodal.dHashDistance(hs(a)._1, hs(a)._2, hs(b)._1, hs(b)._2)
    assert(dist(1L, 2L) == 0, "byte-identical content -> identical hash")
    assert(dist(1L, 3L) <= 6, s"two edited pixels stay near (${dist(1L, 3L)})")
    assert(dist(1L, 4L) >= 48, s"inverted gradient is far (${dist(1L, 4L)})")
    // monotone INCREASING gradient: left sample < right sample everywhere,
    // so no bit is set; the inverted image is the all-ones complement
    assert(hs(1L) == ((0L, 0L)))
    assert(hs(4L) == ((0xFFFFFFFFL, 0xFFFFFFFFL)))
  }

  test("Multimodal: dHash fails loudly on a zero-area grid") {
    import spark.implicits._
    val rows = Seq(Multimodal.MediaRow(1L, "abc".getBytes, "fakeimg", 0, 8))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.dHash(rows.toDS()).collect()
    }
    assert(e.getMessage != null)
  }

  test("Multimodal: dHash resize invariance — the property pHash families exist for") {
    import spark.implicits._
    val big = gradientPng(64, 64)
    val small = Multimodal.resizePng(big, 16, 16)
    val rows = Seq(
      Multimodal.MediaRow(1L, big, "png", 64, 64),
      Multimodal.MediaRow(2L, small, "png", 16, 16))
    val hs = Multimodal.dHash(rows.toDS(), Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(Multimodal.dHashDistance(
      hs(1L)._1, hs(1L)._2, hs(2L)._1, hs(2L)._2) <= 4)
  }

  test("Multimodal: pHash vs dHash on real re-encodes — copy 0, low-freq stability, inversion far") {
    import spark.implicits._
    val base = gradientPng(32, 32)
    val copy = gradientPng(32, 32)
    val perturbed = gradientPng(32, 32, perturb = Set((5, 5), (20, 11)))
    // lossy JPEG re-encode of the same pixels — the canonical "same image,
    // different bytes" corpus event both families exist for
    val jpeg = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(base))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val inverted = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = (31 - x) * 255 / 31
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // genuinely different 2-D content: deterministic pseudo-noise texture
    val noise = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = (x * 37 + y * 101 + x * y * 13) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, base, "png", 32, 32),
      Multimodal.MediaRow(2L, copy, "png", 32, 32),
      Multimodal.MediaRow(3L, perturbed, "png", 32, 32),
      Multimodal.MediaRow(4L, jpeg, "jpg", 32, 32),
      Multimodal.MediaRow(5L, inverted, "png", 32, 32),
      Multimodal.MediaRow(6L, noise, "png", 32, 32))
    val ph = Multimodal.pHash(rows.toDS(), Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dh = Multimodal.dHash(rows.toDS(), Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def pd(a: Long, b: Long): Int =
      Multimodal.dHashDistance(ph(a)._1, ph(a)._2, ph(b)._1, ph(b)._2)
    def dd(a: Long, b: Long): Int =
      Multimodal.dHashDistance(dh(a)._1, dh(a)._2, dh(b)._1, dh(b)._2)
    assert(pd(1L, 2L) == 0, "byte-identical content -> identical pHash")
    // the families DISAGREE exactly where they should: pixel edits touch
    // local gradients (dHash) but barely move the low-frequency block
    assert(pd(1L, 3L) <= dd(1L, 3L),
      s"pHash ${pd(1L, 3L)} should be at most dHash ${dd(1L, 3L)} on local edits")
    assert(pd(1L, 3L) <= 3, s"two edited pixels stay pHash-near (${pd(1L, 3L)})")
    assert(pd(1L, 4L) <= 3, s"JPEG re-encode stays pHash-near (${pd(1L, 4L)})")
    // the mirrored 1-D gradient lives in ~8 DCT coefficients (odd-u terms
    // negate, even ones survive), so it clears the near-dup threshold but
    // not by much — the 1-D blind spot dHash covers (dd(1,5) >= 48 above)
    assert(pd(1L, 5L) > 3, s"inverted gradient is beyond near-dup (${pd(1L, 5L)})")
    assert(dd(1L, 5L) >= 48, s"dHash sees the inversion everywhere (${dd(1L, 5L)})")
    // 2-D content change: far for BOTH families
    assert(pd(1L, 6L) >= 12, s"noise texture is pHash-far (${pd(1L, 6L)})")
    assert(dd(1L, 6L) >= 12, s"noise texture is dHash-far (${dd(1L, 6L)})")
  }

  test("Multimodal: pHash resize invariance") {
    import spark.implicits._
    val big = gradientPng(64, 64)
    val small = Multimodal.resizePng(big, 16, 16)
    val rows = Seq(
      Multimodal.MediaRow(1L, big, "png", 64, 64),
      Multimodal.MediaRow(2L, small, "png", 16, 16))
    val hs = Multimodal.pHash(rows.toDS(), Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(Multimodal.dHashDistance(
      hs(1L)._1, hs(1L)._2, hs(2L)._1, hs(2L)._2) <= 4)
  }

  test("NaiveBayes: learns a class marker, ties break to the smallest label") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val train = Seq(
      (1L, "a", "common words here marker_a marker_a"),
      (2L, "a", "more common words marker_a"),
      (3L, "b", "common words here marker_b marker_b"),
      (4L, "b", "more common words marker_b")).toDF("id", "label", "text")
    val test = Seq(
      (10L, "unseen text with marker_a marker_a"),
      (11L, "unseen text with marker_b marker_b"),
      (12L, "common words here")).toDF("id", "text")
    val pred = NaiveBayes.classify(train, test, "id", "text", "label")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(10L) == "a" && pred(11L) == "b")
    // doc 12: both classes have identical counts for every token and
    // equal priors — an EXACT score tie, broken to the smallest label
    assert(pred(12L) == "a")
    // scores are exact decimals: the tie really is equality, not epsilon
    val sc = NaiveBayes.scores(train, test.filter(col("id") === 12L),
      "id", "text", "label")
      .collect().map(r => r.getString(1) -> r.getDecimal(2)).toMap
    assert(sc("a") == sc("b"))
    // a class whose only training docs carry ZERO tokens must stay in the
    // model (prior + all-smoothing likelihoods), not silently vanish
    val trainZ = train.unionByName(
      Seq((5L, "c", "   ")).toDF("id", "label", "text"))
    val scZ = NaiveBayes.scores(trainZ, test, "id", "text", "label")
      .select(col("cls")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(scZ == Set("a", "b", "c"),
      s"zero-token class dropped from the model: $scZ")
  }

  test("Pq: ADC table-lookup distance equals the exact code-to-query distance") {
    import org.apache.spark.sql.functions._
    val corpus = emb.filter(col("vec_id") >= 3).limit(100)
    val model = Pq.train(corpus, "vec_id", "embedding", m = 4, ks = 4, iters = 2)
    assert(model.m == 4 && model.ks == 4 && model.subDim == 16)
    val codes = Pq.encode(corpus, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    // one query, quantized driver-side exactly like Lloyd.quantize
    val q = Lloyd.quantize(emb.filter(col("vec_id") === 0), "vec_id",
      "embedding", 1000000L).head().getSeq[Long](1).toArray
    val lut = Pq.lookupTable(q, model)
    // Spark-side ADC over the codes column
    val sp = spark
    import sp.implicits._
    val lutDf = Seq((0L, lut.toSeq)).toDF("qid", "lut")
    val adc = Pq.encode(corpus, "vec_id", "embedding", model)
      .crossJoin(broadcast(lutDf))
      .select(col("id"), Pq.adcDistance(col("codes"), col("lut"), model.ks))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent recompute: sum of exact subspace distances between the
    // query slices and each point's ASSIGNED centroids
    for ((id, cs) <- codes) {
      val expected = (0 until model.m).map { j =>
        val cent = model.sub(j).centroids(cs(j))
        (0 until model.subDim).map { i =>
          val d = q(j * model.subDim + i) - cent(i)
          d * d
        }.sum
      }.sum
      assert(adc(id) === expected, s"ADC mismatch for $id")
    }
    // the compression claim: codes are m ints per vector, and every code
    // addresses a real centroid
    assert(codes.values.forall(cs =>
      cs.length == model.m && cs.forall(c => c >= 0 && c < model.ks)))
  }

  test("Multimodal: REAL javax.sound WAV decode — sine features match closed forms") {
    import spark.implicits._
    // a pure sine of amplitude a has RMS a/sqrt(2) and crosses zero 2f
    // times per second; duration and sample count come from the container
    val rows = Seq(
      Multimodal.AudioRow(1L, Multimodal.sineWav(440.0, 0.5, 1.0), "wav"),
      Multimodal.AudioRow(2L, Multimodal.sineWav(100.0, 1.0, 0.5), "wav"),
      Multimodal.AudioRow(3L, Multimodal.sineWav(440.0, 0.0, 0.25), "wav"))
    val f = Multimodal.extractAudioFeatures(rows.toDS())
      .collect().map(a => a.media_id -> a).toMap
    assert(f(1L).sample_rate == 8000.0 && f(1L).n_samples == 8000L)
    assert(math.abs(f(1L).duration_s - 1.0) < 1e-9)
    assert(math.abs(f(1L).rms - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(f(1L).peak - 0.5) < 0.01)
    assert(math.abs(f(1L).zero_cross_rate - 2 * 440.0 / 8000.0) < 0.01)
    assert(math.abs(f(2L).rms - 1.0 / math.sqrt(2)) < 0.01)
    assert(math.abs(f(2L).zero_cross_rate - 2 * 100.0 / 8000.0) < 0.005)
    assert(f(2L).n_samples == 4000L)
    // silence: zero RMS/peak, no crossings (sign is constant at +0)
    assert(f(3L).rms == 0.0 && f(3L).peak == 0.0 && f(3L).zero_cross_rate == 0.0)
  }

  test("Multimodal: WAV decode fails loudly on undecodable bytes") {
    intercept[Exception] {
      Multimodal.decodeWav("definitely not a wav container".getBytes)
    }
  }

  test("Multimodal: audioFingerprint — real WAV path deterministic, copies pair at 0, gain cancels") {
    import spark.implicits._
    val wav = Multimodal.sineWav(440.0, 0.5, 0.1)
    val loud = Multimodal.sineWav(440.0, 0.9, 0.1) // same signal, more gain
    def fp(rows: Seq[Multimodal.AudioRow]): Map[Long, (Long, Long)] =
      Multimodal.audioFingerprint(rows.toDS())
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m = fp(Seq(Multimodal.AudioRow(1L, wav, "wav"),
      Multimodal.AudioRow(2L, wav, "wav"),
      Multimodal.AudioRow(3L, loud, "wav")))
    assert(m(1L) === m(2L)) // byte-identical copy: identical fingerprint
    assert(m === fp(Seq(Multimodal.AudioRow(1L, wav, "wav"),
      Multimodal.AudioRow(2L, wav, "wav"),
      Multimodal.AudioRow(3L, loud, "wav")))) // rerun-deterministic
    // delta coding cancels uniform gain: 0.9x vs 0.5x amplitude scales
    // every window energy by ~the same factor, so the comparison bits
    // agree (quantization can flip near-tie windows of the periodic
    // sine; allow the banding's own tolerance)
    def dist(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(dist(m(1L), m(3L)) <= 3, s"gain changed ${dist(m(1L), m(3L))} bits")
    // the banded pairing (shared with the image families) confirms both
    val pairs = Multimodal.audioNearDupPairs(
        Multimodal.audioFingerprint(Seq(
          Multimodal.AudioRow(1L, wav, "wav"),
          Multimodal.AudioRow(2L, wav, "wav"),
          Multimodal.AudioRow(3L, loud, "wav")).toDS()),
        "media_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("Multimodal: audioFingerprint fakepcm — one-byte edit flips at most 2 bits; short clip refused") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val base = Array.fill(400)((rnd.nextInt(256) - 128).toByte)
    val edited = base.clone(); edited(137) = (edited(137) + 90).toByte
    val m = Multimodal.audioFingerprint(Seq(
        Multimodal.AudioRow(1L, base, "fakepcm"),
        Multimodal.AudioRow(2L, edited, "fakepcm")).toDS())
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val d = java.lang.Long.bitCount(m(1L)._1 ^ m(2L)._1) +
      java.lang.Long.bitCount(m(1L)._2 ^ m(2L)._2)
    assert(d <= 2, s"one-byte edit flipped $d bits") // one window, two deltas
    val e = intercept[Exception] {
      Multimodal.audioFingerprint(Seq(
        Multimodal.AudioRow(9L, Array.fill(10)(1.toByte), "fakepcm")).toDS())
        .collect()
    }
    assert(e.getMessage.contains("65") || e.getCause.getMessage.contains("65"))
  }

  test("Multimodal: audioSpectralHash — exact gain invariance, copy at 0, envelope change far") {
    import spark.implicits._
    // fakepcm with an exactly-scalable envelope: samples 128 ± d and
    // 128 ± 2d have energies in exact ratio 2, so every DCT coefficient
    // AND the median double together — bits must be IDENTICAL
    val rnd = new scala.util.Random(13)
    val deltas = Array.fill(260)(rnd.nextInt(60) + 1)
    def clip(scale: Int): Array[Byte] =
      deltas.zipWithIndex.map { case (d, i) =>
        (128 + (if (i % 2 == 0) d * scale else -d * scale)).toByte }
    def fp(rows: Seq[Multimodal.AudioRow]): Map[Long, (Long, Long)] =
      Multimodal.audioSpectralHash(rows.toDS())
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a different envelope: deltas reversed in time
    val rev = deltas.reverse.zipWithIndex.map { case (d, i) =>
      (128 + (if (i % 2 == 0) d else -d)).toByte }
    val m = fp(Seq(Multimodal.AudioRow(1L, clip(1), "fakepcm"),
      Multimodal.AudioRow(2L, clip(2), "fakepcm"),
      Multimodal.AudioRow(3L, clip(1), "fakepcm"),
      Multimodal.AudioRow(4L, rev, "fakepcm")))
    assert(m(1L) === m(2L), "2x gain changed spectral bits")
    assert(m(1L) === m(3L)) // copy
    assert(m(1L) !== m(4L)) // time-reversed envelope: different shape
    // real WAV path runs and is rerun-deterministic
    val wav = Multimodal.sineWav(440.0, 0.5, 0.1)
    val w1 = fp(Seq(Multimodal.AudioRow(9L, wav, "wav")))
    assert(w1 === fp(Seq(Multimodal.AudioRow(9L, wav, "wav"))))
  }
}
