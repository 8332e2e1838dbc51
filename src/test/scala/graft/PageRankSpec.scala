package graft

import graft.dedup.PageRank

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  // Path graph 1-2-3: degrees 1,2,1. Hand-computed micro-unit rounds:
  // r0 = (1e6, 1e6, 1e6)
  // contribs: node1 ← r(2)/2; node2 ← r(1)/1 + r(3)/1; node3 ← r(2)/2
  // i1: n1 = 150000 + 85·500000/100  = 575000
  //     n2 = 150000 + 85·2000000/100 = 1850000
  //     n3 = 575000
  // i2: n1 = 150000 + 85·925000/100  = 150000 + 786250 = 936250
  //     n2 = 150000 + 85·(575000+575000)/100 = 1127500
  //     n3 = 936250
  // i3: n1 = 150000 + 85·(1127500 DIV 2)/100 = 150000 + 85·563750/100
  //        = 150000 + 479187 (47918750/100 DIV) = 629187
  //     n2 = 150000 + 85·(936250+936250)/100 = 150000 + 1591625 = 1741625
  //     n3 = 629187
  private lazy val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")

  test("3-iteration micro ranks on a path graph match hand computation") {
    val out = PageRank.rankMicro(path, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 629187L, 2L -> 1741625L, 3L -> 629187L))
  }

  test("hub of a star outranks spokes; spokes tie") {
    val star = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))
      .toDF("id_a", "id_b")
    val out = PageRank.rankMicro(star, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) > out(1L))
    assert(Set(1L, 2L, 3L, 4L).map(out) === Set(out(1L)))
  }

  test("duplicate and reversed input pairs do not change the ranking") {
    val dup = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 2L))
      .toDF("id_a", "id_b")
    val a = PageRank.rankMicro(path, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = PageRank.rankMicro(dup, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("regular graph (cycle) stays uniform at the start value") {
    // 4-cycle: every node deg 2, contribution 2·(r/2) = r; damping fixes
    // the uniform point at 150000 + 85·1000000/100 = 1000000 exactly.
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .toDF("id_a", "id_b")
    val out = PageRank.rankMicro(cycle, iters = 3)
      .collect().map(r => r.getLong(1)).toSet
    assert(out === Set(1000000L))
  }

  test("partition invariance: repartitioned input yields identical ranks") {
    val rep = PageRank.rankMicro(path.repartition(7), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = PageRank.rankMicro(path.coalesce(1), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rep === one)
  }
}
