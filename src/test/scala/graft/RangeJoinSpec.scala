package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val Hour = 3600L * 1000000L

  private lazy val probe = Seq(
    (1L, ts("2024-03-01 00:00:00")), // exactly on a range start
    (2L, ts("2024-03-01 05:59:59")),
    (3L, ts("2024-03-01 06:00:00")), // exactly on that range's end → excluded
    (4L, ts("2024-03-02 13:30:00")),
    (5L, ts("2024-03-05 00:00:00"))  // in no range
  ).toDF("pid", "t")

  private lazy val ranges = Seq(
    (100L, ts("2024-03-01 00:00:00"), ts("2024-03-01 06:00:00")), // 6h
    (200L, ts("2024-03-02 03:00:00"), ts("2024-03-03 03:00:00")), // 24h, spans buckets
    (300L, ts("2024-03-01 05:00:00"), ts("2024-03-01 07:00:00"))  // overlaps 100
  ).toDF("rid", "ws", "we")

  private def pairs(widthMicros: Long): Set[(Long, Long)] =
    RangeJoin.bucketedRangeJoin(probe, "t", ranges, "ws", "we", widthMicros)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val naive: Set[(Long, Long)] =
    probe.join(ranges, col("t") >= col("ws") && col("t") < col("we"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("half-open [start, end) semantics, multi-range membership") {
    assert(naive === Set((1L, 100L), (2L, 100L), (2L, 300L), (3L, 300L), (4L, 200L)))
    assert(pairs(6 * Hour) === naive)
  }

  test("bucket width is invisible in the result (coarse, fine, misaligned)") {
    for (w <- Seq(1 * Hour, 7 * Hour, 24 * Hour, 999999999L))
      assert(pairs(w) === naive, s"width $w")
  }

  test("null timestamps and null bounds drop, matching theta-join semantics") {
    val p = Seq((1L, Some(ts("2024-03-01 01:00:00"))), (2L, None))
      .toDF("pid", "t")
    val r = Seq(
      (100L, Some(ts("2024-03-01 00:00:00")), Some(ts("2024-03-02 00:00:00"))),
      (200L, None, Some(ts("2024-03-02 00:00:00"))))
      .toDF("rid", "ws", "we")
    val got = RangeJoin.bucketedRangeJoin(p, "t", r, "ws", "we", 24 * Hour)
      .select("pid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // a null on either side fails the containment predicate in a naive
    // theta join — the bucketed form must agree (null bucket keys don't join)
    assert(got === Set((1L, 100L)))
  }

  test("keyed range join: equality keys gate containment (no cross-key pairs)") {
    val p = Seq(
      (1L, "u1", ts("2024-03-01 01:00:00")),
      (2L, "u2", ts("2024-03-01 01:00:00")), // same instant, other key
      (3L, "u1", ts("2024-03-01 07:00:00"))  // right key, outside range
    ).toDF("pid", "k", "t")
    val r = Seq(
      (100L, "u1", ts("2024-03-01 00:00:00"), ts("2024-03-01 06:00:00")),
      (200L, "u3", ts("2024-03-01 00:00:00"), ts("2024-03-01 06:00:00"))
    ).toDF("rid", "k", "ws", "we")
    val got = RangeJoin.bucketedRangeJoin(p, "t", r, "ws", "we", 6 * Hour,
        keyCols = Seq("k"))
      .select("pid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 100L)))
    // keyed ≡ naive theta join with the key equality added
    val naiveKeyed = p.join(r.withColumnsRenamed(Map("k" -> "rk")),
        col("k") === col("rk") && col("t") >= col("ws") && col("t") < col("we"))
      .select("pid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === naiveKeyed)
  }

  test("inverted ranges (end <= start) explode zero candidate buckets") {
    // Regression: the 2-arg sequence defaults to step -1 when stop < start,
    // so a 50-year inverted range at 1ms grid would explode ~1.6e12 junk
    // buckets (the residual filter hides them — correct output, unbounded
    // work). With the pre-explode guard this returns instantly and empty;
    // without it this test would never finish.
    val bad = Seq(
      (900L, ts("2074-01-01 00:00:00"), ts("2024-03-01 00:00:00")), // inverted, huge
      (901L, ts("2024-03-01 00:00:00"), ts("2024-03-01 00:00:00")), // empty [x, x)
      (100L, ts("2024-03-01 00:00:00"), ts("2024-03-01 06:00:00"))  // valid
    ).toDF("rid", "ws", "we")
    val got = RangeJoin.bucketedRangeJoin(probe, "t", bad, "ws", "we", 1000L)
      .select("pid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // valid range still matches; inverted/empty ranges contribute nothing
    assert(got === Set((1L, 100L), (2L, 100L)))
  }

  test("plans as a hash equi-join on the grid, not a nested-loop theta join") {
    val p = RangeJoin.bucketedRangeJoin(probe, "t", ranges, "ws", "we", 6 * Hour)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketed range join must be an equi-join:\n$p")
  }

  test("registry q_range_join: bucketing invisible vs the naive theta join") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_range_join")(spark, dir).collect()
    val wins = graft.ops.Tables.read(spark, dir, "orders")
      .filter(col("o_orderkey") % 199 === 0)
      .select(col("o_orderkey").as("win_id"), col("o_orderpriority").as("priority"),
        col("o_orderdate").as("ws"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("we"))
    val li = graft.ops.Tables.read(spark, dir, "lineitem")
    val naiveAgg = wins.join(li,
        col("l_shipdate") >= col("ws") && col("l_shipdate") < col("we"), "left")
      .groupBy("win_id", "priority")
      .agg(count(col("l_quantity")).as("n"),
        coalesce(sum("l_quantity"), lit(0.0)).as("sum_qty"))
      .orderBy("win_id").collect()
    assert(got.length === naiveAgg.length)
    got.zip(naiveAgg).foreach { case (g, e) => assert(g === e) }
  }
}
