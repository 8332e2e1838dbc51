package graft

import org.apache.spark.sql.functions._

import graft.ops.Normalize

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0),   // mean 2, sample std 1
    ("b", 5.0), ("b", 5.0),               // zero variance
    ("c", 7.0)                            // single row
  ).toDF("key", "x")

  test("zscore: exact-sum sample stddev; degenerate groups yield NULL") {
    val got = Normalize.zscore(df, Seq("key"), "x", "z")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got === Set(
      ("a", 1.0, Some(-1.0)), ("a", 2.0, Some(0.0)), ("a", 3.0, Some(1.0)),
      ("b", 5.0, None), ("b", 5.0, None),  // σ = 0 → NULL, not Inf/NaN
      ("c", 7.0, None)))                   // n = 1 → NULL, no ANSI abort
  }

  test("minMaxScale: [0,1] within group; constant groups yield NULL") {
    val got = Normalize.minMaxScale(df, Seq("key"), "x", "mm")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got === Set(
      ("a", 1.0, Some(0.0)), ("a", 2.0, Some(0.5)), ("a", 3.0, Some(1.0)),
      ("b", 5.0, None), ("b", 5.0, None),
      ("c", 7.0, None)))
  }

  test("agg+join shape: no stratum Window; stats broadcast back at runtime") {
    // the window formulation collapsed parallelism to |strata| (100× soak:
    // 60M rows through 3 tasks, BASELINE.md) — the plan must compute group
    // stats by partial aggregation and attach them with a broadcast join,
    // keeping the fact scan fully parallel
    val q = Normalize.minMaxScale(
        Normalize.zscore(df, Seq("key"), "x", "z"), Seq("key"), "x", "mm")
    q.collect() // run so AQE settles the join strategy
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"stratum windows serialize the fact table onto |strata| tasks:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"tiny stats must come back as a broadcast join:\n$p")
  }

  test("NULL stratum keys form their own group (null-safe join-back)") {
    val d = Seq((Some("a"), 1.0), (Some("a"), 3.0),
      (None, 10.0), (None, 30.0), (None, 20.0)).toDF("key", "x")
    val got = Normalize.zscore(d, Seq("key"), "x", "z").collect()
      .map(r => (Option(r.getString(0)), r.getDouble(1)) -> r.getDouble(2)).toMap
    // a plain equi-join would orphan the NULL-key rows (z = NULL); window
    // semantics say they normalize among themselves
    assert(got((None, 10.0)) === -1.0)
    assert(got((None, 20.0)) === 0.0)
    assert(got((None, 30.0)) === 1.0)
    assert(got((Some("a"), 3.0)) === 1.0 / math.sqrt(2.0))
  }

  test("quantileGate: per-stratum cutoff, keepBelow flip, NULL stratum group") {
    val d = Seq(
      (Some("x"), 1L), (Some("x"), 2L), (Some("x"), 3L), (Some("x"), 4L),
      (Some("x"), 5L), (Some("x"), 6L), (Some("x"), 7L), (Some("x"), 8L),
      (Some("y"), 10L), (Some("y"), 20L),
      (None, 1L), (None, 100L)
    ).toDF("key", "v")
    def kept(keepBelow: Boolean) =
      Normalize.quantileGate(d, Seq("key"), "v", q = 0.25, keepBelow = keepBelow)
        .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    // x: p25 of 1..8 = 2.75 → keep 3..8; y: p25 = 12.5 → keep 20;
    // NULL stratum gates among itself (p25 = 25.75 → keep 100)
    assert(kept(keepBelow = false) === Set(
      (Some("x"), 3L), (Some("x"), 4L), (Some("x"), 5L), (Some("x"), 6L),
      (Some("x"), 7L), (Some("x"), 8L), (Some("y"), 20L), (None, 100L)))
    // keepBelow keeps the complement plus nothing at the open boundary
    assert(kept(keepBelow = true) === Set(
      (Some("x"), 1L), (Some("x"), 2L), (Some("y"), 10L), (None, 1L)))
  }

  test("quantileGate plans as agg + broadcast join-back, not a stratum window") {
    val q = Normalize.quantileGate(df, Seq("key"), "x", q = 0.5)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"stratum windows serialize the fact table onto |strata| tasks:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"tiny threshold frame must come back as a broadcast join:\n$p")
  }

  test("histogram: lower-bound bins, negatives floor away from zero") {
    val d = Seq(("k", -11L), ("k", -1L), ("k", 0L), ("k", 9L), ("k", 10L), ("k", 25L))
      .toDF("key", "v")
    val got = Normalize.histogram(d, Seq("key"), "v", binWidth = 10)
      .collect().map(r => r.getAs[Long]("bin_lo") -> r.getAs[Long]("n")).toMap
    assert(got === Map(-20L -> 1L, -10L -> 1L, 0L -> 2L, 10L -> 1L, 20L -> 1L))
  }

  test("winsorize: interpolating-percentile clip bounds, rows preserved, nulls-key group") {
    val d = ((1 to 100).map(i => (Some("x"), i.toDouble)) :+ (None, 500.0))
      .toDF("key", "v")
    val w = Normalize.winsorize(d, Seq("key"), "v", "wv", pLow = 0.1, pHigh = 0.9)
    assert(w.count() === 101, "winsorize keeps every row")
    val xs = w.filter(col("key") === "x").select("wv")
      .collect().map(_.getDouble(0))
    // interpolating p10/p90 of 1..100, in the same IEEE arithmetic Spark
    // uses (1 + 0.9*99 is NOT the literal 90.1 in binary doubles)
    val (lo, hi) = (1.0 + 0.1 * 99.0, 1.0 + 0.9 * 99.0)
    assert(xs.min === lo && xs.max === hi)
    assert(xs.count(_ === lo) === 10, "values 1..10 all clip to the lower bound")
    // the NULL stratum is its own group: its single value clips to itself
    val nv = w.filter(col("key").isNull).select("wv").collect().map(_.getDouble(0))
    assert(nv.toSeq === Seq(500.0))
  }

  test("winsorize: interior values pass through untouched") {
    val d = (1 to 100).map(i => ("x", i.toDouble)).toDF("key", "v")
    val w = Normalize.winsorize(d, Seq("key"), "v", "wv", pLow = 0.05, pHigh = 0.95)
      .filter(col("v") === 50.0).select("wv").collect()
    assert(w.map(_.getDouble(0)).toSeq === Seq(50.0))
  }

  test("groupQuantilesHist == builtin percentile bit-for-bit (integral, float, ties)") {
    val ps = Seq(0.0, 0.05, 0.25, 1.0 / 3.0, 0.5, 0.9, 0.95, 1.0)
    // md5-derived deterministic values: integral, repeating, and a float
    // variant with non-terminating interpolation fractions
    val base = spark.range(0, 2000).select(
      (col("id") % 7).cast("string").as("key"),
      (graft.dedup.NearDup.md5Long(col("id").cast("string")) % 40).as("vi"))
    for (d <- Seq(
        base.select(col("key"), col("vi").cast("double").as("v")),
        base.select(col("key"), (col("vi").cast("double") / 8.0 + 0.1).as("v")))) {
      // ref columns are aliased __rN, hist columns __qN: after the join
      // the two sides are DISTINCT fields, so Row.getAs cannot resolve
      // both reads to the same column (which would make the test vacuous)
      val refAggs = ps.zipWithIndex.map { case (p, i) =>
        percentile(col("v"), lit(p)).as(s"__r$i") }
      val ref = d.groupBy("key").agg(refAggs.head, refAggs.tail: _*)
      val fast = Normalize.groupQuantilesHist(d, Seq("key"), "v", ps)
      val joined = ref.join(fast, Seq("key")).collect()
      assert(joined.length === 7)
      joined.foreach { row =>
        ps.indices.foreach { i =>
          val (r, f) = (row.getAs[Double](s"__r$i"), row.getAs[Double](s"__q$i"))
          assert(java.lang.Double.doubleToRawLongBits(r) ===
            java.lang.Double.doubleToRawLongBits(f),
            s"p=${ps(i)} key=${row.getString(0)}: builtin $r != hist $f")
        }
      }
    }
  }

  test("winsorizeHist == winsorize bit-for-bit on real lineitem, incl NULL stratum") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"),
        // NULL stratum for ~1/7 of rows: the null-safe join-back path
        when(col("l_orderkey") % 7 === 0, lit(null)).otherwise(col("l_returnflag"))
          .as("rf"),
        col("l_quantity"))
    val a = Normalize.winsorize(li, Seq("rf"), "l_quantity", "w")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .select("w").collect().map(_.getDouble(0))
    val b = Normalize.winsorizeHist(li, Seq("rf"), "l_quantity", "w")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .select("w").collect().map(_.getDouble(0))
    assert(a.length === b.length)
    a.indices.foreach(i => assert(
      java.lang.Double.doubleToRawLongBits(a(i)) ===
        java.lang.Double.doubleToRawLongBits(b(i)), s"row $i: ${a(i)} != ${b(i)}"))
  }

  test("winsorizeHist: all-NULL group passes values through; plan has no Percentile buffer") {
    val d = Seq(("a", Some(1.0)), ("a", Some(100.0)), ("b", None), ("b", None))
      .toDF("key", "v")
    val w = Normalize.winsorizeHist(d, Seq("key"), "v", "wv")
    assert(w.count() === 4)
    // group b has no non-null values → no stats row → least/greatest
    // null-skip passes v (null) through, same as the builtin form
    assert(w.filter(col("key") === "b").select("wv").collect()
      .forall(_.isNullAt(0)))
    val p = w.queryExecution.executedPlan.toString
    assert(!p.contains("percentile"),
      s"hist form must not plan the buffering percentile aggregate:\n$p")
  }
}
