package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Ann, Ivf}

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("index covers the corpus; cells are non-degenerate") {
    val cents = Ivf.centroids(emb, nLists = 8)
    assert(cents.length === 8)
    val idx = Ivf.buildIndex(emb, cents).cache()
    assert(idx.count() === emb.count())
    val cells = idx.groupBy("cell").count().collect()
    assert(cells.length > 1, "assignment must not collapse into one cell")
  }

  test("probing all cells reproduces brute force exactly") {
    val cents = Ivf.centroids(emb, nLists = 8)
    val idx = Ivf.buildIndex(emb, cents)
    val q = emb.filter(col("vec_id") < 5)
    val ivf = Ivf.topK(idx, q, cents, k = 10, nProbe = 8)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    val brute = Ann.bruteForceTopK(emb, q, k = 10)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    assert(ivf === brute)
  }

  test("trained centroids: probing all cells still reproduces brute force") {
    // one Lloyd refinement must not break probe-exhaustive exactness —
    // the recall/balance improvement is a property of FEWER probes, the
    // correctness contract is independent of where the centroids sit
    val cents = graft.similarity.Kmeans.updatedCentroids(
      emb, Ivf.centroids(emb, nLists = 8))
    val idx = Ivf.buildIndex(emb, cents)
    val q = emb.filter(col("vec_id") < 5)
    val ivf = Ivf.topK(idx, q, cents, k = 10, nProbe = 8)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    val brute = Ann.bruteForceTopK(emb, q, k = 10)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    assert(ivf === brute)
  }

  test("training shrinks within-cell spread (the reason to Lloyd at all)") {
    // quantization error: mean cosine distance of each vector to its own
    // cell centroid — one refinement step must not increase it
    def spread(cents: Seq[(Long, Seq[Double])]): Double = {
      val byCell = cents.toMap
      Ivf.buildIndex(emb, cents).collect().map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble)
        val c = byCell(r.getAs[Long]("cell"))
        val dot = v.zip(c).map { case (a, b) => a * b }.sum
        val nv = math.sqrt(v.map(x => x * x).sum)
        val nc = math.sqrt(c.map(x => x * x).sum)
        1.0 - dot / (nv * nc)
      }.sum
    }
    val seed = Ivf.centroids(emb, nLists = 8)
    val trained = graft.similarity.Kmeans.updatedCentroids(emb, seed)
    assert(spread(trained) <= spread(seed) + 1e-9,
      "a Lloyd step must not increase total quantization error")
  }

  test("persistent index: topKAgainstIndex ≡ from-raw topK after disk round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Ivf.writeIvfIndex(emb, nLists = 8, tmp)
    val q = emb.filter(col("vec_id") < 5)
    val stored = Ivf.topKAgainstIndex(q, tmp, k = 10, nProbe = 4)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    val cents = Ivf.centroids(emb, nLists = 8)
    val fromRaw = Ivf.topK(Ivf.buildIndex(emb, cents), q, cents, k = 10, nProbe = 4)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    assert(stored === fromRaw)
    // stored centroids survive the round-trip bit-exactly
    assert(Ivf.readCentroids(spark, tmp).toSet === cents.toSet)
  }

  test("persistent index: append assigns new vectors to the STORED centroids") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf_idx_app").toString
    val partA = emb.filter(col("vec_id") % 2 === 0)
    val partB = emb.filter(col("vec_id") % 2 === 1)
    Ivf.writeIvfIndex(partA, nLists = 8, tmp)
    Ivf.appendIvfIndex(partB, tmp)
    val q = emb.filter(col("vec_id") < 5)
    val stored = Ivf.topKAgainstIndex(q, tmp, k = 10, nProbe = 8)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    // equivalent from-raw run: partA's centroids, the FULL corpus assigned
    val centsA = Ivf.centroids(partA, nLists = 8)
    val fromRaw = Ivf.topK(Ivf.buildIndex(emb, centsA), q, centsA, k = 10, nProbe = 8)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    assert(stored === fromRaw)
    // nProbe = nLists ⇒ the appended index also reproduces brute force
    val brute = Ann.bruteForceTopK(emb, q, k = 10)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    assert(stored === brute)
  }

  test("persistent index: deleted vectors vanish from probes; survivors unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf_idx_del").toString
    Ivf.writeIvfIndex(emb, nLists = 8, tmp)
    val q = emb.filter(col("vec_id") < 5)
    val before = Ivf.topKAgainstIndex(q, tmp, k = 10, nProbe = 8)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    val deadIds = before.map(_.getLong(2)).take(3)
    Ivf.deleteFromIvfIndex(
      emb.filter(col("vec_id").isin(deadIds.toSeq: _*)).select("vec_id"), tmp)
    val after = Ivf.topKAgainstIndex(q, tmp, k = 10, nProbe = 8)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    assert(after.forall(r => !deadIds.contains(r.getLong(2))))
    // from-raw twin: full-corpus centroids, remaining vectors assigned
    val cents = Ivf.centroids(emb, nLists = 8)
    val remaining = emb.filter(!col("vec_id").isin(deadIds.toSeq: _*))
    val fromRaw = Ivf.topK(Ivf.buildIndex(remaining, cents), q, cents,
        k = 10, nProbe = 8)
      .select("qid", "rank", "cid", "cosine").collect().toSet
    assert(after === fromRaw)
  }

  test("persistent index write leaves ≈1 file per cell (no tasks × cells fan-out)") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf_idx_files").toString
    Ivf.writeIvfIndex(emb, nLists = 8, tmp)
    val counts = leafFileCounts(s"$tmp/lists")
    assert(counts.nonEmpty)
    assert(counts.values.forall(_ == 1),
      s"rebuild must write one file per cell dir, got $counts")
    // an appended batch adds at most one more file per cell it touches
    Ivf.appendIvfIndex(emb.filter(col("vec_id") < 50), tmp)
    assert(leafFileCounts(s"$tmp/lists").values.forall(_ <= 2))
  }

  test("persistent index: probe plan prunes to the probed cells and broadcasts the probe set") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf_idx_plan").toString
    Ivf.writeIvfIndex(emb, nLists = 8, tmp)
    val q = emb.filter(col("vec_id") < 5)
    val df = Ivf.topKAgainstIndex(q, tmp, k = 10, nProbe = 2)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the isin over probed cells reaches the scan as a partition filter
    assert(p.contains("PartitionFilters: [cell"), p)
  }

  test("planted near-neighbors are recalled with few probes") {
    val rnd = new scala.util.Random(11)
    val base = (0L until 10L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val corpus = base.flatMap { case (i, v) =>
      Seq((i * 100, v)) ++ (1 to 3).map(c =>
        (i * 100 + c, v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)))
    }.toDF("vec_id", "embedding")
    val cents = Ivf.centroids(corpus, nLists = 8)
    val idx = Ivf.buildIndex(corpus, cents)
    val queries = corpus.filter(col("vec_id") % 100 === 0)
    val got = Ivf.topK(idx, queries, cents, k = 3, nProbe = 2)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = (0L until 10L).map { i =>
      (got.getOrElse(i * 100, Set.empty) intersect
        Set(i * 100 + 1, i * 100 + 2, i * 100 + 3)).size
    }.sum
    // perturbed copies land in the same cell as their base almost always
    assert(hits >= 24, s"planted recall@3 = $hits/30")
  }
}
