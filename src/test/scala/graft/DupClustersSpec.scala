package graft

import org.apache.spark.sql.functions._

import graft.dedup.DupClusters

class DupClustersSpec extends SparkTestBase {
  import spark.implicits._

  private def pairsDf(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")

  private def labelsOf(ps: Seq[(Long, Long)]): Map[Long, Long] =
    DupClusters.connectedComponents(pairsDf(ps: _*)).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap

  test("canonicalPick: best score wins, ties break to smaller id, singletons self-canonical") {
    val docs = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L), // cluster {1,2,3}: 2 and 3 tie at 9 → 2
      (7L, 1L)                      // singleton: its own canonical
    ).toDF("doc_id", "score")
    val got = DupClusters.canonicalPick(docs, "doc_id", "score",
        pairsDf((1L, 2L), (2L, 3L)))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got(1L) === ((1L, 2L, false)))
    assert(got(2L) === ((1L, 2L, true)))
    assert(got(3L) === ((1L, 2L, false)))
    assert(got(7L) === ((7L, 7L, true)))
    // exactly one canonical per cluster
    assert(got.values.count(_._3) === 2)
  }

  test("connectedComponents: chain A-B, B-C collapses to min label") {
    val m = labelsOf(Seq((2L, 3L), (1L, 2L))) // 1-2, 2-3: one component
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connectedComponents: transitive closure across a pair never emitted") {
    // A≈B and B≈C but (A,C) absent — still one cluster
    val m = labelsOf(Seq((10L, 20L), (20L, 30L), (30L, 40L)))
    assert(m.values.toSet === Set(10L))
    assert(m.keySet === Set(10L, 20L, 30L, 40L))
  }

  test("connectedComponents: disjoint components keep separate minima") {
    val m = labelsOf(Seq((1L, 5L), (5L, 3L), (7L, 9L)))
    assert(m === Map(1L -> 1L, 5L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents: long chain converges (diameter rounds)") {
    // path 0-1-2-...-9: worst-case diameter for 10 nodes
    val chain = (0L until 9L).map(i => (i, i + 1))
    val m = labelsOf(chain)
    assert(m.size === 10)
    assert(m.values.forall(_ == 0L))
  }

  test("connectedComponents: edge direction is irrelevant") {
    assert(labelsOf(Seq((5L, 1L))) === labelsOf(Seq((1L, 5L))))
  }

  test("connectedComponents: maxIter too small hands over to star contraction, same result") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val m = DupClusters.connectedComponents(pairsDf(chain: _*), maxIter = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
    assert(m.size === 10)
    assert(m.values.forall(_ == 0L))
  }

  test("star contraction: 100-node path (diameter 99) converges in O(log n) rounds") {
    // label propagation would need ~99 rounds; large-star/small-star
    // halves chains per round — 15 rounds is generous for n=100
    val chain = (0L until 99L).map(i => (i, i + 1))
    val m = DupClusters.connectedComponentsStar(pairsDf(chain: _*), maxIter = 15)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
    assert(m.size === 100)
    assert(m.values.forall(_ == 0L))
  }

  test("star contraction: agrees with label propagation on a mixed graph") {
    // two cliques bridged by a chain, one separate pair, shuffled ids
    val pairs = Seq(
      (12L, 7L), (7L, 31L), (31L, 12L),      // clique {7,12,31}
      (31L, 40L), (40L, 55L),                // chain to...
      (55L, 60L), (60L, 58L), (58L, 55L),    // clique {55,58,60}
      (90L, 83L))                            // separate component
    val star = DupClusters.connectedComponentsStar(pairsDf(pairs: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val label = labelsOf(pairs).toSet
    assert(star === label)
    assert(star.collect { case (id, c) if id == c => id } === Set(7L, 83L))
  }

  test("star contraction: empty pair set yields no labels") {
    val empty = pairsDf()
    assert(DupClusters.connectedComponentsStar(empty).count() === 0L)
  }

  test("clusterReport: singletons are their own keeper; one keeper per cluster") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val rep = DupClusters.clusterReport(docs, "doc_id", pairsDf((2L, 3L), (3L, 4L)))
      .collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_keeper"))).toSet
    assert(rep === Set(
      (1L, 1L, true),  // singleton: no pair row, own cluster, keeper
      (2L, 2L, true),  // component {2,3,4} keeper
      (3L, 2L, false),
      (4L, 2L, false),
      (5L, 5L, true)))
  }

  test("clusterReport: filter(is_keeper) is the dedup (one survivor per family)") {
    val docs = (0L until 8L).toDF("doc_id")
    val rep = DupClusters.clusterReport(docs, "doc_id",
      pairsDf((0L, 1L), (1L, 2L), (4L, 5L)))
    val keepers = rep.filter(col("is_keeper")).select("id")
      .as[Long].collect().sorted
    assert(keepers === Array(0L, 3L, 4L, 6L, 7L))
  }

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap

  test("mergeComponents: folding batches ≡ one-shot CC on the union of edges") {
    val batch1 = pairsDf((1L, 2L), (5L, 6L), (9L, 10L))
    val batch2 = pairsDf((2L, 5L), (7L, 8L), (10L, 11L))
    val batch3 = pairsDf((8L, 9L), (3L, 4L))
    val oneShot = labelMap(DupClusters.connectedComponentsStar(
      batch1.union(batch2).union(batch3)))
    var labels = DupClusters.connectedComponentsStar(batch1)
    labels = DupClusters.mergeComponents(labels, batch2)
    labels = DupClusters.mergeComponents(labels, batch3)
    assert(labelMap(labels) === oneShot,
      "three-batch fold must land on the one-shot fixpoint")
  }

  test("mergeComponents: a new edge bridges two existing clusters to the global min") {
    val labels = DupClusters.connectedComponentsStar(pairsDf((1L, 2L), (10L, 11L)))
    val merged = labelMap(DupClusters.mergeComponents(labels, pairsDf((2L, 11L))))
    assert(merged === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("mergeComponents: brand-new ids join existing clusters or form their own") {
    val labels = DupClusters.connectedComponentsStar(pairsDf((5L, 6L)))
    val merged = labelMap(DupClusters.mergeComponents(labels,
      pairsDf((6L, 100L), (200L, 201L))))
    assert(merged === Map(5L -> 5L, 6L -> 5L, 100L -> 5L, 200L -> 200L, 201L -> 200L))
  }

  test("mergeComponents: idempotent — re-merging the same edges changes nothing") {
    val edges = pairsDf((1L, 2L), (2L, 3L))
    val labels = DupClusters.connectedComponentsStar(edges)
    val again = DupClusters.mergeComponents(labels, edges)
    assert(labelMap(again) === labelMap(labels))
  }

  test("mergeComponents: batch whose edges all collapse within one cluster (incl. self-pairs)") {
    val labels = DupClusters.connectedComponentsStar(pairsDf((1L, 2L), (2L, 3L)))
    // (1,3) maps to quotient (1,1) — filtered; (2,2) is a self-pair;
    // nothing reaches the quotient graph, labeling must pass through
    val merged = labelMap(DupClusters.mergeComponents(labels, pairsDf((1L, 3L), (2L, 2L))))
    assert(merged === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("mergeComponents: a new-id-only self-pair still registers the id as a singleton") {
    val labels = DupClusters.connectedComponentsStar(pairsDf((1L, 2L)))
    val merged = labelMap(DupClusters.mergeComponents(labels, pairsDf((42L, 42L))))
    assert(merged === Map(1L -> 1L, 2L -> 1L, 42L -> 42L))
  }

  test("mergeComponents: a batch chain through a new id merges three old clusters") {
    val labels = DupClusters.connectedComponentsStar(
      pairsDf((10L, 11L), (20L, 21L), (30L, 31L)))
    val merged = labelMap(DupClusters.mergeComponents(labels,
      pairsDf((11L, 99L), (99L, 21L), (21L, 31L))))
    assert(merged.values.toSet === Set(10L))
    assert(merged.keySet === Set(10L, 11L, 20L, 21L, 30L, 31L, 99L))
  }

  test("clusterReportFromLabels ≡ clusterReport over the same pair set") {
    val docs = (0L until 8L).toDF("doc_id")
    val edges = pairsDf((0L, 1L), (1L, 2L), (4L, 5L))
    val viaLabels = DupClusters.clusterReportFromLabels(docs, "doc_id",
        DupClusters.connectedComponentsStar(edges))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("is_keeper"))).toSet
    val direct = DupClusters.clusterReport(docs, "doc_id", edges)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("is_keeper"))).toSet
    assert(viaLabels === direct)
  }

  // r17 optimization guard: the driver-local union-find fast path (edge
  // lists at/below spark.graft.cc.smallGraphMaxEdges) must land on the
  // IDENTICAL min-id fixpoint as the distributed rounds, in both CC
  // forms, on shapes that exercise chains, merges, self-pairs and
  // singleton-via-self-pair ids. The conf toggle forces each path.
  test("small-graph fast path ≡ distributed rounds (both CC forms)") {
    val edges = pairsDf(
      (5L, 9L), (9L, 2L), (30L, 31L), (31L, 32L), (32L, 33L), // chain + chain
      (7L, 7L),                                               // self-pair
      (2L, 30L))                                              // cross-merge
    def run(maxEdges: String, star: Boolean): Map[Long, Long] = {
      spark.conf.set("spark.graft.cc.smallGraphMaxEdges", maxEdges)
      try {
        val cc = if (star) DupClusters.connectedComponentsStar(edges)
          else DupClusters.connectedComponents(edges)
        cc.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
      } finally spark.conf.unset("spark.graft.cc.smallGraphMaxEdges")
    }
    val expected = Map(5L -> 2L, 9L -> 2L, 2L -> 2L, 30L -> 2L, 31L -> 2L,
      32L -> 2L, 33L -> 2L, 7L -> 7L)
    assert(run("65536", star = true) === expected)   // fast path
    assert(run("0", star = true) === expected)       // distributed rounds
    assert(run("65536", star = false) === expected)
    assert(run("0", star = false) === expected)
  }
}
