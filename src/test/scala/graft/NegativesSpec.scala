package graft

import org.apache.spark.sql.functions._

import graft.similarity.Negatives

class NegativesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val corpus = (1L to 100L).toDF("id")
  private lazy val pool = Negatives.negativePool(corpus, "id", poolSize = 20)

  private lazy val positives = Seq(
    (1L, 2L), (1L, 3L), (5L, 1L)
  ).toDF("qid", "pid")

  test("pool is the md5-bottom sample, stable run-over-run") {
    val a = pool.collect().map(_.getLong(0)).toSet
    val b = Negatives.negativePool(corpus, "id", 20).collect()
      .map(_.getLong(0)).toSet
    assert(a.size === 20)
    assert(a === b)
  }

  test("negatives exclude the query and its positives; exactly k per query") {
    val out = Negatives.attachNegatives(positives, "qid", "pid", pool, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet === Set(1L, 5L))
    assert(byQ(1L).length === 5 && byQ(5L).length === 5)
    assert(!out.exists { case (q, n, _) => q == n },
      "a query must never be its own negative")
    assert(!byQ(1L).map(_._2).contains(2L) && !byQ(1L).map(_._2).contains(3L),
      "true positives are excluded")
    assert(byQ(1L).map(_._3).sorted === Array(1, 2, 3, 4, 5))
  }

  test("different queries draw different k-subsets (salted order)") {
    val out = Negatives.attachNegatives(positives, "qid", "pid", pool, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n1 = out.filter(_._1 == 1L).map(_._2).toSeq
    val n5 = out.filter(_._1 == 5L).map(_._2).toSeq
    assert(n1 !== n5, "per-query salt must vary the selection or its order")
  }

  test("pool top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = pool.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"pool must not global-sort:\n$p")
  }
}
