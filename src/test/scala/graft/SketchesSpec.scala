package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

  test("approxDistinctPerKey: HLL estimate within the rsd bound of exact") {
    val approx = Sketches.approxDistinctPerKey(
      lineitem, Seq("l_returnflag"), "l_orderkey", rsd = 0.02)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("approx_distinct"))).toMap
    val exact = lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("d"), count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n"), r.getAs[Long]("d"))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (n, d)) =>
      val (nA, dA) = approx(k)
      assert(nA === n, s"$k: exact row count must be exact")
      val relErr = math.abs(dA - d).toDouble / d
      // rsd 2%: allow 5 sigma
      assert(relErr < 0.10, s"$k: approx $dA vs exact $d (relErr $relErr)")
    }
  }

  test("approxQuantilesPerKey: rank error within n/accuracy of exact quantiles") {
    val probs = Seq(0.25, 0.5, 0.75)
    val approx = Sketches.approxQuantilesPerKey(
      lineitem, Seq("l_returnflag"), "l_quantity", probs, accuracy = 10000)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        r.getSeq[Double](1)).toMap
    val exact = lineitem.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), array(probs.map(lit): _*)).as("qs"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        r.getSeq[Double](1)).toMap
    exact.foreach { case (k, eqs) =>
      approx(k).zip(eqs).foreach { case (a, e) =>
        // l_quantity spans 1..50; accuracy 10000 on ~20k rows/key keeps
        // the rank error within a couple of adjacent integer values
        assert(math.abs(a - e) <= 2.0, s"$k: approx $a vs exact $e")
      }
    }
  }

  test("sketch aggregation is partial (map-side) — shuffle carries buffers, not keys") {
    val p = Sketches.approxDistinctPerKey(lineitem, Seq("l_returnflag"), "l_orderkey")
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"HLL must partial-aggregate before the exchange:\n$p")
  }

  test("countMin: one-sided error — est >= exact for EVERY key, est == min over rows") {
    val counts = lineitem.groupBy(col("l_shipdate").cast("string").as("k"))
      .agg(count(lit(1)).as("c")).localCheckpoint()
    val depth = 4; val width = 8 // ~2400 ship dates into 8 buckets: collisions certain
    val sk = Sketches.countMinSketch(counts, "k", "c", depth, width)
    val skRows = sk.collect()
    assert(skRows.length <= depth * width, "sketch must be depth*width bounded")
    // every row's counters sum to the total multiplicity
    val total = counts.agg(sum("c")).collect()(0).getLong(0)
    skRows.groupBy(_.getAs[Int]("r")).foreach { case (r, rows) =>
      assert(rows.map(_.getAs[Long]("cnt")).sum === total,
        s"hash row $r must partition the full count mass")
    }
    val est = Sketches.countMinEstimate(sk, counts.select("k"), "k", depth, width)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("cms_est")).toMap
    val exact = counts.collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("c")).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k: CMS must never underestimate (est ${est(k)} < exact $c)")
    }
    // at least the min-property: no estimate exceeds the total
    est.values.foreach(e => assert(e <= total))
  }

  test("countMin estimate is exact when width makes collisions impossible") {
    val counts = lineitem.groupBy(col("l_returnflag").as("k"))
      .agg(count(lit(1)).as("c")).localCheckpoint()
    // 3 keys into 4096 buckets across 4 rows: P(any row collides) ~ 0;
    // the min over rows then recovers the exact count for every key
    val sk = Sketches.countMinSketch(counts, "k", "c", depth = 4, width = 4096)
    val est = Sketches.countMinEstimate(sk, counts.select("k"), "k", 4, 4096)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("cms_est")).toMap
    counts.collect().foreach { r =>
      assert(est(r.getAs[String]("k")) === r.getAs[Long]("c"))
    }
  }

  test("countMin estimate join broadcasts the sketch side") {
    val counts = lineitem.groupBy(col("l_shipdate").cast("string").as("k"))
      .agg(count(lit(1)).as("c"))
    val sk = Sketches.countMinSketch(counts, "k", "c", 4, 16)
    val p = Sketches.countMinEstimate(sk, counts.select("k"), "k", 4, 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the d*w-bounded sketch must broadcast, never shuffle the candidates against it:\n$p")
  }
}
