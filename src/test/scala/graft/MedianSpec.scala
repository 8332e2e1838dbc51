package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExactMedian

class MedianSpec extends SparkTestBase {
  import spark.implicits._

  test("finish semantics: odd middle, even mean-of-middles, null skip, empty NULL") {
    val df = Seq(
      ("odd", Some(3.0)), ("odd", Some(1.0)), ("odd", Some(2.0)),
      ("even", Some(1.0)), ("even", Some(2.0)), ("even", Some(3.0)), ("even", Some(10.0)),
      ("nulls", Some(5.0)), ("nulls", None), ("nulls", Some(7.0)),
      ("allnull", None), ("allnull", None)
    ).toDF("k", "x")
    val got = df.groupBy("k").agg(ExactMedian($"x").as("med"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got("odd") === 2.0)
    assert(got("even") === 2.5)  // (2+3)/2
    assert(got("nulls") === 6.0) // NULLs skipped, not zero-counted
    assert(got("allnull") === null)
  }

  test("agrees with Spark's exact percentile(0.5) on real data") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val got = li.groupBy("l_returnflag")
      .agg(ExactMedian($"l_quantity").as("med"),
        percentile($"l_quantity", lit(0.5)).as("p50"))
      .collect()
    assert(got.nonEmpty)
    // l_quantity is integral-valued: (lo+hi)/2 vs interpolation coincide
    got.foreach(r => assert(r.getDouble(1) === r.getDouble(2), r.getString(0)))
  }

  test("works over an unbounded window frame (the W6 gap this Aggregator closes)") {
    // unbounded-frame windowed median ≡ group median joined back per row
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 9.0), ("b", 4.0), ("b", 6.0))
      .toDF("k", "x")
    val w = Window.partitionBy("k")
    val windowed = df.withColumn("med", ExactMedian($"x").over(w))
      .select("k", "x", "med").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(windowed(("a", 1.0)) === 2.0)
    assert(windowed(("a", 9.0)) === 2.0)
    assert(windowed(("b", 4.0)) === 5.0)
  }

  test("plans with map-side partial aggregation (buffers merge, rows don't all shuffle)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val p = li.groupBy("l_returnflag").agg(ExactMedian($"l_quantity").as("med"))
      .queryExecution.executedPlan.toString
    // ScalaAggregator is a TypedImperativeAggregate → ObjectHashAggregate
    // with a partial stage below the exchange
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
  }
}
