package graft

import org.apache.spark.sql.functions._

import graft.ops.Linkage

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val master = Seq(
    (1L, "john smith"),
    (2L, "mary jones"),
    (3L, "bob brown")
  ).toDF("id", "name")

  private lazy val dirty = Seq(
    (101L, "jon smith"),   // 1 deletion from john smith
    (102L, "mary joness"), // 1 insertion
    (103L, "alice white"), // no true match
    (104L, "bobb brown")   // 1 insertion, early in the string
  ).toDF("id", "name")

  // block on the last 4 chars: robust to edits earlier in the string
  private def block(c: org.apache.spark.sql.Column) = substring(c, -4, 4)

  private def links(k: Int): Set[(Long, Long, Int)] =
    Linkage.fuzzyJoin(master, "id", "name", dirty, "id", "name", block, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("within-block edit-distance matches, with exact distances") {
    assert(links(1) === Set((1L, 101L, 1), (3L, 104L, 1)))
    // "mary joness" blocks on 'ness' vs master 'ones' → blocked out even
    // though the true distance is 1: the recall/blocking trade-off
  }

  test("threshold zero is exact-match-only") {
    val exact = Linkage.fuzzyJoin(master, "id", "name",
      master.withColumnRenamed("id", "id2"), "id2", "name", block, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === Set((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("wider threshold admits farther pairs inside the block") {
    assert(links(3).map(x => (x._1, x._2)).contains((1L, 101L)))
    assert(!links(3).exists(_._2 == 103L), "alice white matches nothing")
  }

  test("the join is a hash equi-join on the block, never a nested loop") {
    val p = Linkage.fuzzyJoin(master, "id", "name", dirty, "id", "name",
      block, 1).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocked linkage must equi-join:\n$p")
  }
}
