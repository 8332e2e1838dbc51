package graft

import org.apache.spark.sql.functions._

import graft.ops.Hll

class HllSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val events =
    graft.ops.Tables.readEvents(spark, "/root/testdata/sf0.001")
      .select(to_date(col("ts")).as("day"), col("user_id"))

  test("registers: rho derived from the 60-bit hash, bounds [1, 55]") {
    val df = Seq(("k", "someval")).toDF("k", "v")
    val regs = Hll.registers(df, Seq("k"), "v").collect()
    assert(regs.length === 1)
    val (reg, maxrho) = (regs(0).getAs[Long]("reg"), regs(0).getAs[Int]("maxrho"))
    // independent recomputation from the same md5-derived hash
    val h = df.select(graft.dedup.NearDup.md5Long(col("v")).as("h"))
      .head.getLong(0)
    assert(reg === h % 64)
    val rest = h >> 6
    val expectedRho =
      if (rest == 0L) 55 else 55 - java.lang.Long.toBinaryString(rest).length
    assert(maxrho === expectedRho)
    assert(maxrho >= 1 && maxrho <= 55)
  }

  test("registers are partition-invariant (max is order-free)") {
    val a = Hll.registers(events.repartition(1), Seq("day"), "user_id")
      .collect().map(_.toString).sorted.toSeq
    val b = Hll.registers(events.repartition(7), Seq("day"), "user_id")
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("union-of-sketches == sketch-of-union, bit-equal registers") {
    val even = events.filter(col("user_id") % 2 === 0)
    val odd = events.filter(col("user_id") % 2 =!= 0)
    val merged = Hll.mergeRegisters(
        Hll.registers(even, Seq("day"), "user_id")
          .unionByName(Hll.registers(odd, Seq("day"), "user_id")),
        Seq("day"))
      .collect().map(_.toString).sorted.toSeq
    val oneShot = Hll.registers(events, Seq("day"), "user_id")
      .collect().map(_.toString).sorted.toSeq
    assert(merged === oneShot)
  }

  test("merge is idempotent: merging a sketch with itself is identity") {
    val regs = Hll.registers(events, Seq("day"), "user_id")
    val doubled = Hll.mergeRegisters(regs.unionByName(regs), Seq("day"))
      .collect().map(_.toString).sorted.toSeq
    assert(doubled === regs.collect().map(_.toString).sorted.toSeq)
  }

  test("estimate tracks exact distinct within HLL error (m=64 → assert ±30%)") {
    val est = Hll.distinctSketch(events, Seq("day"), "user_id")
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("est_micro") / 1e6).toMap
    val exact = events.groupBy("day")
      .agg(countDistinct(col("user_id")).as("d")).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (day, d) =>
      val e = est(day)
      assert(math.abs(e - d) <= math.max(0.30 * d, 3.0),
        s"day $day: est $e vs exact $d out of tolerance")
    }
  }

  test("register accounting: nreg + v_zero = 64, t_scaled consistent") {
    val out = Hll.distinctSketch(events, Seq("day"), "user_id").collect()
    out.foreach { r =>
      val vz = r.getAs[Long]("v_zero")
      val t = r.getAs[Long]("t_scaled")
      assert(vz >= 0 && vz < 64)
      // empty registers contribute 2^54 each; occupied ones at least 1
      assert(t >= vz * (1L << 54) + (64 - vz))
      assert(t <= 64L * (1L << 54))
    }
  }

  test("estimate clamps the rho = p+1 all-zero-rank-bits case (no negative shift)") {
    // no 54-zero-bit preimage is findable, so feed estimate() a
    // hand-built register row at the maximal rank 55: unclamped,
    // 1L << (54-55) wraps to Long.MinValue and corrupts t_scaled
    val regs = Seq(("k", 0L, 55), ("k", 1L, 1)).toDF("k", "reg", "maxrho")
    val out = Hll.estimate(regs, Seq("k")).collect()
    assert(out.length === 1)
    val t = out(0).getAs[Long]("t_scaled")
    // reg 0 at rho=55 clamps to 2^0 = 1 (the rho=54 value); reg 1 at
    // rho=1 contributes 2^53; 62 empty registers contribute 2^54 each
    assert(t === 1L + (1L << 53) + 62L * (1L << 54))
    assert(out(0).getAs[Long]("est_micro") > 0)
  }

  test("pairwiseOverlap: identical sets → inter = each single, jaccard = 1e6 exactly") {
    // keys a and b carry the SAME value set: union registers == each
    // single's registers, so est_union == est_a == est_b and the
    // inclusion–exclusion collapses algebraically, not approximately
    val vals = (1 to 300).map(_.toString)
    val df = (vals.map(("a", _)) ++ vals.map(("b", _))).toDF("k", "v")
    val out = Hll.pairwiseOverlap(Hll.registers(df, Seq("k"), "v"), "k").collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[String]("ka") === "a" && r.getAs[String]("kb") === "b")
    assert(r.getAs[Long]("est_a_micro") === r.getAs[Long]("est_union_micro"))
    assert(r.getAs[Long]("est_inter_micro") === r.getAs[Long]("est_a_micro"))
    assert(r.getAs[Long]("jaccard_micro") === 1000000L)
  }

  test("pairwiseOverlap: disjoint sets → small jaccard; half-overlap sits between") {
    val base = (1 to 600).map(i => s"tok$i")
    val disjoint = (base.take(300).map(("a", _)) ++ base.drop(300).map(("b", _)))
      .toDF("k", "v")
    val dj = Hll.pairwiseOverlap(Hll.registers(disjoint, Seq("k"), "v"), "k")
      .head.getAs[Long]("jaccard_micro")
    // m=64 → ~13% per-estimate error; inclusion–exclusion compounds it,
    // so assert a loose ordering-scale bound, not a tight value
    assert(dj < 400000L, s"disjoint jaccard_micro $dj not near 0")
    val half = (base.take(400).map(("a", _)) ++ base.drop(200).map(("b", _)))
      .toDF("k", "v") // 200 shared of 600 union → true jaccard 1/3
    val hj = Hll.pairwiseOverlap(Hll.registers(half, Seq("k"), "v"), "k")
      .head.getAs[Long]("jaccard_micro")
    assert(hj > dj, s"half-overlap jaccard $hj not above disjoint $dj")
    assert(hj < 1000000L)
  }

  test("pairwiseOverlap: C(k,2) unordered pairs, ka < kb, partition-invariant") {
    val df = (1 to 200).flatMap(i => Seq(("s1", s"v$i"), ("s2", s"w$i"),
      ("s3", s"v$i"), ("s4", s"x${i % 50}"))).toDF("k", "v")
    val a = Hll.pairwiseOverlap(Hll.registers(df.repartition(1), Seq("k"), "v"), "k")
      .collect().map(_.toString).sorted.toSeq
    val b = Hll.pairwiseOverlap(Hll.registers(df.repartition(7), Seq("k"), "v"), "k")
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
    assert(a.length === 6) // C(4,2)
    Hll.pairwiseOverlap(Hll.registers(df, Seq("k"), "v"), "k").collect()
      .foreach(r => assert(r.getAs[String]("ka") < r.getAs[String]("kb")))
  }

  test("segments round-trip: disk merge equals in-memory one-shot estimate") {
    val tmp = java.nio.file.Files.createTempDirectory("hll_seg_spec")
    val segPath = tmp.resolve("seg").toString
    Hll.writeSegments(events.filter(col("user_id") % 2 === 0),
      Seq("day"), "user_id", segPath)
    Hll.writeSegments(events.filter(col("user_id") % 2 =!= 0),
      Seq("day"), "user_id", segPath)
    val fromDisk = Hll.estimateFromSegments(spark, segPath, Seq("day"))
      .collect().map(_.toString).sorted.toSeq
    val oneShot = Hll.distinctSketch(events, Seq("day"), "user_id")
      .collect().map(_.toString).sorted.toSeq
    assert(fromDisk === oneShot)
  }
}
