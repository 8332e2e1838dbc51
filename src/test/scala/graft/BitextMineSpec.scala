package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Ann, BitextMine}

class BitextMineSpec extends SparkTestBase {
  import spark.implicits._

  // hand-built (qid, cid, cosine, rank) retrieval tables
  private def rk(rows: Seq[(Long, Long, Double)]) =
    rows.groupBy(_._1).toSeq.flatMap { case (q, xs) =>
      xs.sortBy(r => (-r._3, r._2)).zipWithIndex.map { case ((_, c, s), i) =>
        (q, c, s, i + 1)
      }
    }.toDF("qid", "cid", "cosine", "rank")

  test("hub normalization: the margin demotes a vector close to everything") {
    // y=100 is a hub: cosine 0.9 with BOTH queries; y=200 is specific:
    // 0.85 with query 1 only. Raw cosine ranks the hub first for q1;
    // margin must prefer the specific neighbor.
    val fwd = rk(Seq(
      (1L, 100L, 0.9), (1L, 200L, 0.85),
      (2L, 100L, 0.9), (2L, 200L, 0.1)))
    val bwd = rk(Seq(
      (100L, 1L, 0.9), (100L, 2L, 0.9),
      (200L, 1L, 0.85), (200L, 2L, 0.1)))
    val got = BitextMine.marginPairs(fwd, bwd, k = 2, minMarginMicro = 0L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    // q1: margin(1,100) = 2*0.9/((0.875)+(0.9)) ≈ 1.014;
    //     margin(1,200) = 2*0.85/((0.875)+(0.475)) ≈ 1.259 → 200 wins
    assert(got === Seq((1L, 200L), (2L, 100L)))
  }

  test("mutuality: a pair absent from the backward top-k is dropped") {
    val fwd = rk(Seq((1L, 100L, 0.9)))
    val bwd = rk(Seq((100L, 2L, 0.95))) // 100's own top-k does not contain 1
    assert(BitextMine.marginPairs(fwd, bwd, k = 1, minMarginMicro = 0L)
      .count() === 0L)
    assert(BitextMine.marginPairs(fwd, bwd, k = 1, minMarginMicro = 0L,
      mutual = false).count() === 1L)
  }

  test("threshold and best-per-query are applied on the integer micro margin") {
    val fwd = rk(Seq((1L, 100L, 0.9), (1L, 200L, 0.9)))
    val bwd = rk(Seq((100L, 1L, 0.9), (200L, 1L, 0.9)))
    val all = BitextMine.marginPairs(fwd, bwd, k = 2, minMarginMicro = 0L,
      bestPerQuery = false)
      .as[(Long, Long, Double, Long, Double)].collect().toSeq
    assert(all.size === 2)
    // symmetric construction → equal margins (exactly 1.0: cos = avg)
    assert(all.forall(_._4 === 1000000L))
    val best = BitextMine.marginPairs(fwd, bwd, k = 2, minMarginMicro = 0L)
      .as[(Long, Long, Double, Long, Double)].collect().toSeq
    assert(best.map(r => (r._1, r._2)) === Seq((1L, 100L))) // tie → lower id_b
    assert(BitextMine.marginPairs(fwd, bwd, k = 2, minMarginMicro = 1000001L)
      .count() === 0L)
  }

  test("negative-denominator neighborhoods are excluded, not divided") {
    val fwd = rk(Seq((1L, 100L, -0.2), (1L, 200L, -0.9)))
    val bwd = rk(Seq((100L, 1L, -0.2), (200L, 1L, -0.9)))
    // sums are negative → den < 0 → no rows, no DIVIDE_BY_ZERO/garbage
    assert(BitextMine.marginPairs(fwd, bwd, k = 2, minMarginMicro = Long.MinValue)
      .count() === 0L)
  }

  test("end-to-end over real embeddings: deterministic, mutual, margin-sorted sane") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val fwd = Ann.bruteForceTopK(b, a, k = 4)
    val bwd = Ann.bruteForceTopK(a, b, k = 4)
    val run1 = BitextMine.marginPairs(fwd, bwd, k = 4, minMarginMicro = 1000000L)
      .orderBy("id_a").collect().toSeq
    val run2 = BitextMine.marginPairs(fwd, bwd, k = 4, minMarginMicro = 1000000L)
      .orderBy("id_a").collect().toSeq
    assert(run1 === run2, "mining must be deterministic")
    assert(run1.nonEmpty, "fixture should yield at least one mutual pair")
    // parity split → sides disjoint; id_a even, id_b odd
    assert(run1.forall(r => r.getAs[Long]("id_a") % 2 == 0
      && r.getAs[Long]("id_b") % 2 == 1))
    // one best pair per query
    val ids = run1.map(_.getAs[Long]("id_a"))
    assert(ids.distinct.size === ids.size)
  }
}
