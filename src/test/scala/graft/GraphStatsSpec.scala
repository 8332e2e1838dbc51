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
}
