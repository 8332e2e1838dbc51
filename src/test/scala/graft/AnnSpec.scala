package graft

import org.apache.spark.sql.functions._

import graft.similarity.Ann

class AnnSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()

  test("bruteForceTopK: k results per query, ranks dense, self excluded") {
    val q = emb.filter(col("vec_id") < 3)
    val top = Ann.bruteForceTopK(emb, q, k = 5).cache()
    assert(top.count() === 15)
    assert(top.filter(col("qid") === col("cid")).count() === 0)
    val ranks = top.filter(col("qid") === 0).orderBy("rank")
      .select("rank").collect().map(_.getInt(0)).toSeq
    assert(ranks === (1 to 5))
    // scores non-increasing with rank
    val scores = top.filter(col("qid") === 0).orderBy("rank")
      .select("cosine").collect().map(_.getDouble(0)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("lshBucketedTopK: planted near-neighbors are recalled") {
    import spark.implicits._
    // LSH's contract is finding *genuinely close* vectors, so plant them:
    // for each of 10 base vectors add 3 slightly-perturbed copies.
    val rnd = new scala.util.Random(7)
    val base = (0L until 10L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val corpus = base.flatMap { case (i, v) =>
      val copies = (1 to 3).map { c =>
        (i * 100 + c, v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
      }
      Seq((i * 100, v)) ++ copies
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 100 === 0)

    val got = Ann.lshBucketedTopK(corpus, queries, k = 3, nBits = 8, dim = 64, nTables = 4)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = (0L until 10L).map { i =>
      val expect = Set(i * 100 + 1, i * 100 + 2, i * 100 + 3)
      (got.getOrElse(i * 100, Set.empty) intersect expect).size
    }.sum
    assert(hits >= 24, s"planted-neighbor recall@3 = $hits/30") // ≥80%
  }

  test("lshBucketedTopK scores agree exactly with brute force on overlap") {
    val q = emb.filter(col("vec_id") < 10)
    val exactScores = Ann.bruteForceTopK(emb, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val approxScores = Ann.lshBucketedTopK(emb, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val overlap = exactScores.keySet intersect approxScores.keySet
    assert(overlap.nonEmpty)
    overlap.foreach { k =>
      assert(exactScores(k) === approxScores(k), "cosines must agree exactly")
    }
  }

  test("lshShuffledTopK ≡ lshBucketedTopK when queries = corpus (same candidates, ranks, scores)") {
    // identical plane seeds + probes → identical candidate sets (the cap
    // doesn't bind at this SF), and both exact-rank within candidates →
    // results must agree row-for-row. This pins the non-broadcast variant
    // to the oracle-proven broadcast one.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "cid", "cosine").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val shuffled = rows(Ann.lshShuffledTopK(emb, emb, k = 5))
    val broadcasted = rows(Ann.lshBucketedTopK(emb, emb, k = 5))
    assert(shuffled === broadcasted)
  }

  test("lshShuffledTopK: planted near-neighbors recalled with queries = corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0L until 10L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val corpus = base.flatMap { case (i, v) =>
      val copies = (1 to 3).map { c =>
        (i * 100 + c, v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
      }
      Seq((i * 100, v)) ++ copies
    }.toDF("vec_id", "embedding")
    // corpus-vs-corpus retrieval: every vector is a query
    val got = Ann.lshShuffledTopK(corpus, corpus, k = 3)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = (0L until 10L).map { i =>
      val expect = Set(i * 100 + 1, i * 100 + 2, i * 100 + 3)
      (got.getOrElse(i * 100, Set.empty) intersect expect).size
    }.sum
    assert(hits >= 24, s"planted-neighbor recall@3 = $hits/30") // ≥80%
  }

  test("lshShuffledTopK: no broadcast of either side; caps degenerate buckets") {
    import spark.implicits._
    // plan shape: with auto-broadcast off, the operator must not FORCE a
    // broadcast anywhere — that's the whole point of the variant (the
    // broadcast one, by contract, must keep its hint).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = Ann.lshShuffledTopK(emb, emb, k = 5)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastExchange"), s"large-|Q| path must not broadcast:\n$p")
      val pb = Ann.lshBucketedTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
        .queryExecution.executedPlan.toString
      assert(pb.contains("BroadcastExchange"), "broadcast variant must keep its hint")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // bucket cap: 40 identical vectors form one degenerate bucket per
    // table → dropped whole; the 2-vector direction keeps its neighbors
    val rnd = new scala.util.Random(3)
    val hot = Array.fill(64)(rnd.nextGaussian().toFloat)
    val cold = Array.fill(64)(rnd.nextGaussian().toFloat)
    val corpus = ((0L until 40L).map(i => (i, hot.clone())) ++
      Seq((100L, cold.clone()), (101L, cold.map(x => x + 0.01f))))
      .toDF("vec_id", "embedding")
    // nBits pinned: this asserts the CAP; auto-sizing a 42-vector corpus
    // would give 4-bit buckets where random directions collide by chance
    val got = Ann.lshShuffledTopK(corpus, corpus, k = 3, nBits = 8, maxBucket = 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((100L, 101L), (101L, 100L)), s"got $got")
  }

  test("nBitsFor: occupancy bounded as the corpus grows — candidate volume stays ~linear") {
    // the scale law (BASELINE.md): candidate volume ≈ nTables × (nBits+1)
    // × |Q| × |C|/2^nBits. Auto-sizing must hold |C|/2^nBits (occupancy)
    // bounded so 10× corpus means ~10× candidates, not ~100×.
    val ladder = Seq(1000L, 10000L, 100000L, 1000000L, 10000000L, 100000000L)
    ladder.foreach { n =>
      val b = Ann.nBitsFor(n)
      val occ = n.toDouble / (1L << b)
      assert(occ <= 8.0 + 1e-9, s"|C|=$n nBits=$b occupancy=$occ exceeds target")
      assert(occ > 2.0, s"|C|=$n nBits=$b occupancy=$occ over-split (recall waste)")
    }
    // reproduces the measured-good AnnBench configs
    assert(Ann.nBitsFor(2000L) === 8)
    assert(Ann.nBitsFor(20000L) === 12)
    // 10× corpus growth at auto bits: per-query candidate volume grows
    // ≤ ~1.4× (the (bits+1) probe factor), i.e. total work stays ~linear
    ladder.init.zip(ladder.tail).foreach { case (n, n10) =>
      def perQueryVol(c: Long) = {
        val b = Ann.nBitsFor(c)
        4.0 * (b + 1) * (c.toDouble / (1L << b))
      }
      val growth = perQueryVol(n10) / perQueryVol(n)
      assert(growth <= 1.6,
        s"per-query candidate volume grew ${growth}× for 10× corpus ($n→$n10)")
    }
    // clamps: tiny corpora floor at 4 bits, planet-scale ceils at 28
    assert(Ann.nBitsFor(10L) === 4)
    assert(Ann.nBitsFor(Long.MaxValue / 2) === 28)
  }

  test("auto-nBits wiring: default ≡ explicit nBitsFor(corpus.count())") {
    val q = emb.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "cid", "cosine").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val auto = rows(Ann.lshBucketedTopK(emb, q, k = 5))
    val pinned = rows(Ann.lshBucketedTopK(emb, q, k = 5, nBits = Ann.nBitsFor(emb.count())))
    assert(auto === pinned)
  }

  test("embeddingNearDups: symmetric pairs, threshold respected, a<b") {
    val dups = Ann.embeddingNearDups(emb, threshold = 0.2).collect()
    dups.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.2)
    }
  }

  test("embeddingNearDups: degenerate buckets are capped, not exploded") {
    import spark.implicits._
    // plant a boilerplate bucket: 40 copies of one direction all land in
    // the same LSH bucket; 2 genuinely-near vectors in another direction.
    val rnd = new scala.util.Random(3)
    val hot = Array.fill(64)(rnd.nextGaussian().toFloat)
    val cold = Array.fill(64)(rnd.nextGaussian().toFloat)
    val corpus = ((0L until 40L).map(i => (i, hot.clone())) ++
      Seq((100L, cold.clone()), (101L, cold.map(x => x + 0.01f))))
      .toDF("vec_id", "embedding")
    val pairs = Ann.embeddingNearDups(corpus, threshold = 0.9, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 40-copy bucket (780 pairs) is dropped whole; the small bucket
    // survives — the cap kills boilerplate without touching real signal
    assert(pairs === Set((100L, 101L)), s"got $pairs")
    // and without the cap the hot bucket floods the result
    val uncapped = Ann.embeddingNearDups(corpus, threshold = 0.9, maxBucket = 1000).count()
    assert(uncapped === 780 + 1)
  }

  test("embeddingNearDupsAgainstCorpus: planted cross-split dup found; batch-split invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    val other = Array.fill(64)(rnd.nextGaussian().toFloat)
    // seen corpus holds base; the batch carries a near-copy + an unrelated vector
    val seen = Seq((100L, base.clone()), (101L, other.clone()))
      .toDF("vec_id", "embedding")
    val batch = Seq((1L, base.map(x => x + 0.01f)),
      (2L, Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val got = Ann.embeddingNearDupsAgainstCorpus(batch, seen, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L)), s"got $got")
    // split invariance: per-row independence means any batch split unions
    // to the one-shot result
    val oneShot = Ann.embeddingNearDupsAgainstCorpus(
        emb.filter(col("vec_id") < 1000), emb.filter(col("vec_id") >= 1000),
        threshold = 0.3, nBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unioned = (Ann.embeddingNearDupsAgainstCorpus(
        emb.filter(col("vec_id") < 500), emb.filter(col("vec_id") >= 1000),
        threshold = 0.3, nBits = 8).collect() ++
      Ann.embeddingNearDupsAgainstCorpus(
        emb.filter(col("vec_id") >= 500 && col("vec_id") < 1000),
        emb.filter(col("vec_id") >= 1000),
        threshold = 0.3, nBits = 8).collect())
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unioned === oneShot)
  }

  test("embeddingNearDupsAgainstCorpus: seen-side bucket cap; equal-id self-skip") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val hot = Array.fill(64)(rnd.nextGaussian().toFloat)
    // 40 boilerplate copies in the SEEN corpus fill one bucket past the cap
    val seen = (0L until 40L).map(i => (i, hot.clone())).toDF("vec_id", "embedding")
    val batch = Seq((200L, hot.map(x => x + 0.001f))).toDF("vec_id", "embedding")
    val capped = Ann.embeddingNearDupsAgainstCorpus(batch, seen,
      threshold = 0.9, maxBucket = 10)
    assert(capped.count() === 0L, "the over-cap seen bucket must drop whole")
    val uncapped = Ann.embeddingNearDupsAgainstCorpus(batch, seen,
      threshold = 0.9, maxBucket = 1000)
    assert(uncapped.count() === 40L)
    // re-ingesting the corpus against itself never pairs an id with itself
    val self = Ann.embeddingNearDupsAgainstCorpus(seen, seen,
        threshold = 0.9, maxBucket = 1000)
      .filter(col("new_id") === col("seen_id")).count()
    assert(self === 0L)
  }

  test("embeddingNearDupsAgainstIndex ≡ from-raw after disk round-trip; probes prune") {
    val tmp = java.nio.file.Files.createTempDirectory("embed_idx").toString
    val seen = emb.filter(col("vec_id") % 2 === 1)
    val batch = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 200)
    Ann.writeEmbedNearDupIndex(seen, tmp, nBits = 8)
    val stored = Ann.embeddingNearDupsAgainstIndex(batch, tmp, threshold = 0.3)
    val got = stored.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val raw = Ann.embeddingNearDupsAgainstCorpus(batch, seen, threshold = 0.3, nBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === raw, "stored-index probe must equal the from-raw detector")
    assert(got.nonEmpty)
    // the small batch's bucket list must reach the file index as a
    // partition filter, not a post-scan filter
    val p = stored.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && !p.contains("PartitionFilters: []"),
      s"expected a non-empty PartitionFilters on the index read:\n$p")
  }

  test("openEmbedNearDupIndex handle ≡ path probe ≡ from-raw; tombstones honored") {
    val tmp = java.nio.file.Files.createTempDirectory("embed_idx_handle").toString
    val seen = emb.filter(col("vec_id") % 2 === 1)
    val batch = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 200)
    Ann.writeEmbedNearDupIndex(seen, tmp, nBits = 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val handle = Ann.openEmbedNearDupIndex(spark, tmp)
    val viaHandle = pairs(Ann.embeddingNearDupsAgainstHandle(batch, handle, threshold = 0.3))
    val viaPath = pairs(Ann.embeddingNearDupsAgainstIndex(batch, tmp, threshold = 0.3))
    assert(viaHandle === viaPath, "handle probe must equal the path probe")
    assert(viaHandle.nonEmpty)
    // the handle is a point-in-time snapshot: tombstones written BEFORE
    // open are honored, exactly like the path variant
    val victim = viaHandle.head._2
    import spark.implicits._
    Ann.deleteFromEmbedNearDupIndex(Seq(victim).toDF("vec_id"), tmp)
    val h2 = Ann.openEmbedNearDupIndex(spark, tmp)
    assert(pairs(Ann.embeddingNearDupsAgainstHandle(batch, h2, threshold = 0.3))
      === viaHandle.filterNot(_._2 == victim))
    // saturating probe (every bucket hit) also agrees with from-raw
    val tmpSat = java.nio.file.Files.createTempDirectory("embed_idx_handle_sat").toString
    Ann.writeEmbedNearDupIndex(seen, tmpSat, nBits = 2)
    val full = emb.filter(col("vec_id") % 2 === 0)
    val hSat = Ann.openEmbedNearDupIndex(spark, tmpSat)
    val gotSat = Ann.embeddingNearDupsAgainstHandle(full, hSat, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawSat = Ann.embeddingNearDupsAgainstCorpus(full, seen, threshold = 0.3, nBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSat === rawSat)
  }

  test("embeddingNearDupsAgainstIndex: coarse geometry and full-batch probes stay exact") {
    // nBits=2 (4 buckets): every bucket is hit by the full-parity batch,
    // so the prune filter degenerates to all buckets — results must
    // still equal the from-raw detector bit-for-bit
    val tmp = java.nio.file.Files.createTempDirectory("embed_idx_sat").toString
    val seen = emb.filter(col("vec_id") % 2 === 1)
    Ann.writeEmbedNearDupIndex(seen, tmp, nBits = 2)
    val batch = emb.filter(col("vec_id") % 2 === 0)
    val got = Ann.embeddingNearDupsAgainstIndex(batch, tmp, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = Ann.embeddingNearDupsAgainstCorpus(batch, seen, threshold = 0.3, nBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === raw, "coarse-bucket geometry must still agree with from-raw")
  }

  test("embed index append ≡ whole-corpus from-raw; erase unflags and is idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("embed_idx_verbs").toString
    val seen = emb.filter(col("vec_id") % 2 === 1)
    val partA = seen.filter(col("vec_id") % 4 === 1)
    val partB = seen.filter(col("vec_id") % 4 === 3)
    Ann.writeEmbedNearDupIndex(partA, tmp, nBits = 8)
    Ann.appendEmbedNearDupIndex(partB, tmp)
    val batch = emb.filter(col("vec_id") % 2 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val appended = pairs(Ann.embeddingNearDupsAgainstIndex(batch, tmp, threshold = 0.3))
    // from-raw twin under the same pinned geometry (nBits=8 at write)
    val raw = pairs(Ann.embeddingNearDupsAgainstCorpus(batch, seen,
      threshold = 0.3, nBits = 8))
    assert(appended === raw, "write+append must equal the whole-corpus detector")
    assert(appended.nonEmpty)
    // erase one matched seen id: its pairs vanish, everything else stays
    val victim = appended.head._2
    import spark.implicits._
    Ann.deleteFromEmbedNearDupIndex(Seq(victim).toDF("vec_id"), tmp)
    val afterErase = pairs(Ann.embeddingNearDupsAgainstIndex(batch, tmp, threshold = 0.3))
    assert(afterErase === appended.filterNot(_._2 == victim))
    // double delete is a no-op
    Ann.deleteFromEmbedNearDupIndex(Seq(victim).toDF("vec_id"), tmp)
    assert(pairs(Ann.embeddingNearDupsAgainstIndex(batch, tmp, threshold = 0.3))
      === afterErase)
  }

  test("dim mismatch fails fast instead of silently bucketing on a prefix") {
    import spark.implicits._
    val narrow = Seq((0L, Array.fill(32)(1.0f)), (1L, Array.fill(32)(1.0f)))
      .toDF("vec_id", "embedding")
    val eN = intercept[Exception] {
      Ann.embeddingNearDups(narrow, threshold = 0.5, dim = 64).collect()
    }
    assert(eN.getMessage.contains("dim=64"), eN.getMessage)
    val eL = intercept[Exception] {
      Ann.lshBucketedTopK(narrow, narrow, k = 1, dim = 64).collect()
    }
    assert(eL.getMessage.contains("dim=64"), eL.getMessage)
  }

  test("recallAtK: exact-vs-itself is 1.0; hand-built overlap counts hit exactly") {
    import spark.implicits._
    val exact = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5)
    val self = Ann.recallAtK(exact, exact, k = 5).collect()
    assert(self.length === 3)
    self.foreach(r => assert(r.getAs[Double]("recall") === 1.0))

    // synthetic: q1 shares 1 of 2; q2 shares 0 of 2 (approx missing entirely)
    val ex = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 20L), (2L, 2, 21L))
      .toDF("qid", "rank", "cid")
    val ap = Seq((1L, 1, 10L), (1L, 2, 99L)).toDF("qid", "rank", "cid")
    val out = Ann.recallAtK(ap, ex, k = 2)
      .collect().map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))).toMap
    assert(out(1L) === ((1L, 0.5)))
    assert(out(2L) === ((0L, 0.0)), "a query the index lost entirely must still report")
  }

  test("recallAtK: short truth list divides by |truth|, so recall can reach 1.0") {
    import spark.implicits._
    // corpus smaller than k+1: truth has only 2 entries but k=5 —
    // dividing by the constant k would cap recall at 0.4 forever
    val ex = Seq((1L, 1, 10L), (1L, 2, 11L)).toDF("qid", "rank", "cid")
    val ap = Seq((1L, 1, 11L), (1L, 2, 10L), (1L, 3, 99L)).toDF("qid", "rank", "cid")
    val r = Ann.recallAtK(ap, ex, k = 5).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_hits") === 2L)
    assert(r(0).getAs[Double]("recall") === 1.0)
  }

  test("recallAtK: IVF nProbe=all recovers brute-force recall 1.0 on the corpus") {
    import graft.similarity.Ivf
    val qs = emb.filter(col("vec_id") < 3)
    val exact = Ann.bruteForceTopK(emb, qs, k = 5)
    val cents = Ivf.centroids(emb, nLists = 4)
    val idx = Ivf.buildIndex(emb, cents)
    val full = Ivf.topK(idx, qs, cents, k = 5, nProbe = 4) // all cells probed
    val rec = Ann.recallAtK(full, exact, k = 5).collect()
    rec.foreach(r => assert(r.getAs[Double]("recall") === 1.0,
      s"probing every cell must equal brute force: ${r}"))
  }
}
