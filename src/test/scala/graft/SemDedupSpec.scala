package graft

import org.apache.spark.sql.functions._

import graft.similarity.SemDedup

class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  // Two well-separated cells on the 2D axes; vectors are near-copies of
  // one axis or the other, so assignment is unambiguous.
  private val cents = Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0))

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("dedupReport: higher id of each over-threshold within-cell pair drops") {
    val corpus = emb(
      1L -> Seq(1.0f, 0.01f),  // cell 0, group min → kept
      2L -> Seq(1.0f, 0.02f),  // ≈ vec 1 → dropped
      3L -> Seq(1.0f, 0.00f),  // ≈ vec 1 → dropped (even though also ≈ vec 2)
      4L -> Seq(0.01f, 1.0f),  // cell 1, kept (nothing close)
      5L -> Seq(0.6f, 0.8f))   // cell 1 (closer to y), cosine vs 4 ≈ 0.81 → dropped
    val m = SemDedup.dedupReport(corpus, cents, threshold = 0.8)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("cell"), r.getAs[Boolean]("kept"))).toMap
    assert(m(1L) === (0L, true))
    assert(m(2L) === (0L, false))
    assert(m(3L) === (0L, false))
    assert(m(4L) === (1L, true))
    assert(m(5L) === (1L, false))
  }

  test("cluster-local by design: duplicates straddling cells both survive") {
    val corpus = emb(
      1L -> Seq(0.72f, 0.70f),  // barely cell 0
      2L -> Seq(0.70f, 0.72f))  // barely cell 1 — cosine vs 1 ≈ 0.999
    val kept = SemDedup.dedupReport(corpus, cents, threshold = 0.9)
      .filter(col("kept")).count()
    assert(kept === 2L) // the documented recall trade of cell-local search
  }

  test("oversize cells skip pair search — members all kept") {
    val corpus = emb(
      1L -> Seq(1.0f, 0.0f), 2L -> Seq(1.0f, 0.0f), 3L -> Seq(1.0f, 0.0f))
    val all = SemDedup.dedupReport(corpus, cents, threshold = 0.9, maxCell = 2)
      .collect()
    assert(all.forall(_.getAs[Boolean]("kept"))) // cell 0 has 3 > maxCell=2
  }

  test("survivors: anti-join equals the kept set of the report") {
    val corpus = emb(
      1L -> Seq(1.0f, 0.01f), 2L -> Seq(1.0f, 0.02f), 4L -> Seq(0.01f, 1.0f))
    val surv = SemDedup.survivors(corpus, cents, threshold = 0.8)
      .select("vec_id").as[Long].collect().sorted.toSeq
    val keptIds = SemDedup.dedupReport(corpus, cents, threshold = 0.8)
      .filter(col("kept")).select("id").as[Long].collect().sorted.toSeq
    assert(surv === keptIds)
    assert(surv === Seq(1L, 4L))
  }
}
