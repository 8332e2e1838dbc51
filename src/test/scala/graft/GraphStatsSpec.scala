package graft

import graft.dedup.GraphStats

class GraphStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphStats.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: four triangles, every node in three") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("paths and stars are triangle-free") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
    assert(counts(Seq((1L, 2L), (1L, 3L), (1L, 4L))) === Map.empty)
  }

  test("orientation, duplicates, and self-loops are normalized away") {
    // same triangle given as unordered, duplicated, self-looped mess
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L), (3L, 3L))
    assert(counts(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge count both") {
    // 1-2-3 and 2-3-4 share edge (2,3)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(g) === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("clustering coefficients: clique 1.0, hub 0.0, leaf NULL") {
    // triangle 1-2-3 plus leaf 4 on node 1, star center 5 over 6,7
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (5L, 6L), (5L, 7L))
    val out = GraphStats.clusteringCoefficients(g.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(2L) === ((2L, 1L, Some(1.0))))  // both neighbors adjacent
    assert(out(1L) === ((3L, 1L, Some(0.333333)))) // 1 of 3 wedges closed
    assert(out(5L) === ((2L, 0L, Some(0.0))))  // open wedge hub
    assert(out(4L) === ((1L, 0L, None)))       // leaf: undefined
  }
}
