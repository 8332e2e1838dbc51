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
}
