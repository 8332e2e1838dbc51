package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("most recent right row at or before each left time, per key") {
    val trades = Seq( // (key, t, qty)
      ("A", 10L, 1), ("A", 20L, 2), ("A", 30L, 3), ("B", 15L, 4))
      .toDF("sym", "t", "qty")
    val quotes = Seq( // (key, t, px)
      ("A", 5L, 1.0), ("A", 20L, 2.0), ("A", 25L, 3.0), ("B", 99L, 9.0))
      .toDF("sym", "t", "px")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", Seq("px"))
      .orderBy("sym", "t").collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("t"),
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)))
    assert(out.toSeq === Seq(
      ("A", 10L, Some(1.0)), // quote@5
      ("A", 20L, Some(2.0)), // tie: quote@20 visible (<= semantics)
      ("A", 30L, Some(3.0)), // quote@25
      ("B", 15L, None))) // no quote yet → null (left-join semantics)
  }

  test("left columns survive untouched; row count preserved") {
    val l = Seq((1L, "k", 100L, "payload")).toDF("id", "k", "t", "extra")
    val r = Seq(("k", 50L, 7.5)).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(l, r, "k", "t", Seq("v"))
    assert(out.count() === 1)
    val row = out.head()
    assert(row.getAs[String]("extra") === "payload")
    assert(row.getAs[Double]("v") === 7.5)
  }
}
