package graft

import org.apache.spark.sql.functions._

import graft.ops.TopKSketch

class TopKSketchSpec extends SparkTestBase {
  import spark.implicits._

  // batch 1: a×5 b×3 c×2 d×1;  batch 2: b×4 d×3 e×2 a×1
  private val b1 = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
    .toDF("item2").withColumnRenamed("item2", "it")
  private val b2 = (Seq.fill(4)("b") ++ Seq.fill(3)("d") ++ Seq.fill(2)("e") ++ Seq("a"))
    .toDF("it")

  test("batchSummary: exact top-k with the (k+1)-th count as the bound") {
    val s = TopKSketch.batchSummary(b1, Seq.empty, "it", k = 2)
      .orderBy(col("cnt").desc).as[(String, Long, Long)].collect().toSeq
    // top-2 of batch 1 = a:5, b:3; bound = c's 2
    assert(s === Seq(("a", 5L, 2L), ("b", 3L, 2L)))
    // k ≥ distinct items -> bound 0 (bracket degenerates to exact)
    val all = TopKSketch.batchSummary(b1, Seq.empty, "it", k = 10)
      .as[(String, Long, Long)].collect()
    assert(all.length === 4 && all.forall(_._3 === 0L))
  }

  test("merged brackets: lower from stored counts, upper adds absent-batch bounds") {
    val seg = TopKSketch.batchSummary(b1, Seq.empty, "it", 2).withColumn("batch_id", lit("b1"))
      .unionByName(TopKSketch.batchSummary(b2, Seq.empty, "it", 2).withColumn("batch_id", lit("b2")))
    val m = TopKSketch.mergedTopK(seg, Seq.empty, topN = 3)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // batch 2 top-2 = b:4, d:3; bound = e's 2. total bound = 2 + 2
    // b present in both: lower 3+4=7, upper 7+0 = 7
    // a present in b1 only (dropped in b2): lower 5, upper 5 + 2
    // d present in b2 only: lower 3, upper 3 + 2
    assert(m === Map("b" -> ((7L, 7L)), "a" -> ((5L, 7L)), "d" -> ((3L, 5L))))
    // the bracket contains the exact counts (a=6, b=7, d=4)
    assert(5L <= 6 && 6 <= 7); assert(m("b") === ((7L, 7L))); assert(3L <= 4 && 4 <= 5)
  }

  test("segment round-trip through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("topksketch").toString + "/seg"
    TopKSketch.writeSegment(b1, Seq.empty, "it", 2, 1L, dir)
    TopKSketch.writeSegment(b2, Seq.empty, "it", 2, 2L, dir)
    val m = TopKSketch.topKFromSegments(spark, dir, Seq.empty, 3)
      .orderBy(col("cnt_lower").desc, col("item"))
      .as[(String, Long, Long)].collect().toSeq
    assert(m === Seq(("b", 7L, 7L), ("a", 5L, 7L), ("d", 3L, 5L)))
  }

  test("keyed summaries rank per key and stay partition-invariant") {
    val data = (0L until 300L)
      .map(i => (s"src${i % 2}", s"u${i % (7 + (i % 2).toInt * 5)}"))
      .toDF("k", "it")
    def run(parts: Int) = {
      val seg1 = TopKSketch.batchSummary(
        data.repartition(parts).filter($"it" =!= "u0"), Seq("k"), "it", 3)
        .withColumn("batch_id", lit("x"))
      val seg2 = TopKSketch.batchSummary(
        data.repartition(parts).filter($"it" === "u0"), Seq("k"), "it", 3)
        .withColumn("batch_id", lit("y"))
      TopKSketch.mergedTopK(seg1.unionByName(seg2), Seq("k"), 3)
        .orderBy("k", "item").collect().toSeq
    }
    assert(run(1) === run(8))
    assert(run(1).nonEmpty)
  }

  test("brackets always contain the exact counts (property, generous and tight k)") {
    val rnd = (0L until 500L).map(i => ((i * i + 13) % 37).toString).toDF("it")
    val exact = rnd.groupBy("it").count().as[(String, Long)].collect().toMap
    for (k <- Seq(3, 10, 50)) {
      val seg = TopKSketch.batchSummary(rnd.filter(expr("CAST(it AS INT) % 2 = 0")), Seq.empty, "it", k)
        .withColumn("batch_id", lit("even"))
        .unionByName(TopKSketch.batchSummary(rnd.filter(expr("CAST(it AS INT) % 2 = 1")), Seq.empty, "it", k)
          .withColumn("batch_id", lit("odd")))
      val rep = TopKSketch.mergedTopK(seg, Seq.empty, topN = 100)
        .as[(String, Long, Long)].collect()
      rep.foreach { case (it, lo, hi) =>
        assert(lo <= exact(it) && exact(it) <= hi, s"k=$k item=$it [$lo,$hi] vs ${exact(it)}")
      }
      // generous k covers everything exactly
      if (k == 50) rep.foreach { case (it, lo, hi) =>
        assert(lo === exact(it) && hi === exact(it))
      }
    }
  }
}
