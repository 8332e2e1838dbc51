package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("temperatureMix: alpha=1 is natural proportions; alpha=0.5 upweights small sources") {
    val df = ((1L to 900L).map(i => ("big", i)) ++ (901L to 1000L).map(i => ("small", i)))
      .toDF("source", "id")
    val natural = Sampling.temperatureMix(df, "source", "id", alpha = 1.0, totalBudget = 100L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(natural === Map("big" -> 90L, "small" -> 10L))
    // sqrt weights: 30 vs 10 → 75/25 — the small source gains share
    val tempered = Sampling.temperatureMix(df, "source", "id", alpha = 0.5, totalBudget = 100L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tempered === Map("big" -> 75L, "small" -> 25L))
    // deterministic: rebuild selects the same ids
    def ids() = Sampling.temperatureMix(df, "source", "id", alpha = 0.5, totalBudget = 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids() === ids())
  }

  test("temperatureMix: budget never exceeds a source's population") {
    val df = ((1L to 5L).map(i => ("tiny", i)) ++ (6L to 1000L).map(i => ("big", i)))
      .toDF("source", "id")
    // tiny's tempered share would exceed its 5 rows — capped by least(n)
    val got = Sampling.temperatureMix(df, "source", "id", alpha = 0.1, totalBudget = 800L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("tiny") === 5L, got.toString)
    assert(got("big") <= 995L)
  }

  test("assignSplit: disjoint, exhaustive, ~proportional, id-stable under growth") {
    val ids = (1L to 5000L).map(i => Tuple1(i)).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.assignSplit(ids, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // exhaustive: every row assigned to a declared split
    assert(got.size === 5000 && got.values.toSet === Set("train", "val", "test"))
    // ~proportional (md5 buckets are uniform; 5000 rows → ±3σ ≈ ±1.7%)
    val frac = got.values.groupBy(identity).view.mapValues(_.size / 5000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.03, frac.toString)
    assert(math.abs(frac("val") - 0.1) < 0.02, frac.toString)
    assert(math.abs(frac("test") - 0.1) < 0.02, frac.toString)
    // THE property: assignment depends only on the row's own id — a
    // subset (or future superset) never re-shuffles anyone's split
    val subset = Sampling.assignSplit(
        ids.filter($"id" % 7 === 0), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, s) => assert(got(id) === s, s"id $id moved splits") }
  }

  test("assignGroupSplit: no group ever straddles two splits") {
    // 2000 rows across 40 groups; row-level hashing WOULD straddle
    // (q.e.d. by the row-level form), group-level hashing must not.
    val rows = (1L to 2000L).map(i => (i, s"group_${i % 40}"))
      .toDF("id", "grp")
    val splits = Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2)
    val byGroup = Sampling.assignGroupSplit(rows, "grp", splits)
      .select("grp", "split").distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet)
    assert(byGroup.size === 40)
    byGroup.foreach { case (g, ss) =>
      assert(ss.size === 1, s"group $g straddles splits: $ss") }
    // contrast: the row-level form on the same data DOES straddle —
    // the leak this operator exists to prevent
    val rowLevel = Sampling.assignSplit(rows, "id", splits)
      .select("grp", "split").distinct().count()
    assert(rowLevel > 40L, "row-level hashing should straddle groups")
  }

  test("nearDupSafeSplit: near-dup pairs are atomic; singletons match the naive split") {
    import org.apache.spark.sql.DataFrame
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def naiveOf(df: DataFrame) = Sampling.assignSplit(df, "doc_id", splits)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // find two ids whose DOC-LEVEL hashes land in different splits, so
    // the naive split WOULD leak a near-dup pair across the boundary —
    // this keeps the test non-vacuous whatever md5 does
    val probe = (0L until 64L).toDF("doc_id")
    val naive = naiveOf(probe)
    val (idA, idB) = (0L until 64L).combinations(2)
      .map(p => (p(0), p(1)))
      .find { case (a, b) => naive(a) != naive(b) }
      .get
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (idA, shared), (idB, shared + " iota"), // near-dups of each other
      (7000L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val pairs = Seq((idA, idB)).toDF("id_a", "id_b")
    val safe = Sampling.nearDupSafeSplit(docs, "doc_id", pairs, splits)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("split"), r.getAs[Long]("cluster_id")))).toMap
    // the pair shares one split and one cluster (the min id)
    assert(safe(idA)._1 === safe(idB)._1)
    assert(safe(idA)._2 === idA && safe(idB)._2 === idA)
    // and the naive split on these ids WOULD have straddled
    assert(naive(idA) !== naive(idB))
    // the singleton keeps its own id as cluster — assignment unchanged
    assert(safe(7000L)._2 === 7000L)
    assert(safe(7000L)._1 === naiveOf(docs.filter(col("doc_id") === 7000L))(7000L))
  }

  test("assignSplit: fraction rounding cannot orphan a bucket; bad fractions rejected") {
    // thirds: cumulative thresholds 333333 / 666667 / pinned 10⁶ — the
    // last split takes the exact remainder, nothing falls through
    val ids = (1L to 300L).map(i => Tuple1(i)).toDF("id")
    val thirds = Sampling.assignSplit(ids, "id",
        Seq("a" -> (1.0 / 3), "b" -> (1.0 / 3), "c" -> (1.0 / 3)))
      .collect().map(_.getString(1))
    assert(thirds.length === 300 && thirds.toSet === Set("a", "b", "c"))
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(ids, "id", Seq("a" -> 1.5, "b" -> -0.5))
    }
  }

  test("weightedSamplePerKey: deterministic, k per key, ranks dense") {
    val df = (1L to 100L).map(i => (s"k${i % 4}", i, (i % 7 + 1).toDouble))
      .toDF("key", "id", "w")
    val a = Sampling.weightedSamplePerKey(df, Seq("key"), "id", "w", k = 5)
      .select("key", "rk", "id").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val b = Sampling.weightedSamplePerKey(df, Seq("key"), "id", "w", k = 5)
      .select("key", "rk", "id").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(a.sorted.toSeq === b.sorted.toSeq, "rebuilds must be byte-identical")
    val perKey = a.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    perKey.foreach { case (k, ranks) => assert(ranks === (1 to 5), s"$k: $ranks") }
  }

  test("weightedSamplePerKey: selection is weight-proportional (A-ES)") {
    // 400 independent keys, each holding item A (w=9) and item B (w=1),
    // k=1: A-ES selects A with probability 9/10 per key. The md5-fixed
    // priorities make the outcome deterministic; across 400 distinct id
    // pairs the A-fraction must sit near 0.9 (±5 sd ≈ ±0.075).
    val df = (0L until 400L).flatMap { g =>
      Seq((s"g$g", g * 2, 9.0, "A"), (s"g$g", g * 2 + 1, 1.0, "B"))
    }.toDF("key", "id", "w", "tag")
    val picked = Sampling.weightedSamplePerKey(df, Seq("key"), "id", "w", k = 1)
      .groupBy("tag").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val aFrac = picked.getOrElse("A", 0L).toDouble / 400.0
    assert(aFrac > 0.825 && aFrac < 0.975, s"A-fraction $aFrac should be ≈0.9")
  }

  test("weightedSamplePerKey: non-positive weights are excluded; top-k prunes") {
    val df = Seq(("k", 1L, 2.0), ("k", 2L, 0.0), ("k", 3L, -1.0), ("k", 4L, 5.0))
      .toDF("key", "id", "w")
    val out = Sampling.weightedSamplePerKey(df, Seq("key"), "id", "w", k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 4L))
    // the rank filter must plan as WindowGroupLimit (k rows of state per
    // key, not the whole partition) — asserted on a realistically-sized
    // input (the optimizer skips the rewrite when k covers the relation)
    val big = (1L to 100L).map(i => (s"k${i % 4}", i, (i % 7 + 1).toDouble))
      .toDF("key", "id", "w")
    val p = Sampling.weightedSamplePerKey(big, Seq("key"), "id", "w", k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("stratifiedSample: ceil(frac x stratum) per stratum, deterministic") {
    // strata of 8, 5, 1 rows at frac=0.25 → keep 2, 2, 1
    val df = ((1L to 8L).map(("a", _)) ++ (9L to 13L).map(("b", _)) ++ Seq(("c", 14L)))
      .toDF("key", "id")
    val got = Sampling.stratifiedSample(df, Seq("key"), "id", frac = 0.25)
    val byKey = got.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    // ranks are contiguous from 1 and rebuilds agree (md5 order is fixed)
    val a = got.select("key", "rk", "id").collect().map(_.toSeq).toSet
    val b = Sampling.stratifiedSample(df, Seq("key"), "id", frac = 0.25)
      .select("key", "rk", "id").collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("tokenBudgetPerKey: inclusive running sum caps each key at the budget") {
    val df = Seq(("s", 1L, 40L), ("s", 2L, 40L), ("s", 3L, 40L), ("t", 9L, 500L))
      .toDF("key", "id", "n_tokens")
    val got = Sampling.tokenBudgetPerKey(df, Seq("key"), "id", "n_tokens", budget = 100L)
      .select("key", "id", "cum_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val s = got.filter(_._1 == "s")
    assert(s.length === 2, s"kept ${s.toSeq}") // 3rd doc would overflow 100
    assert(s.map(_._3).max === 80L)
    assert(got.count(_._1 == "t") === 0)       // first doc alone busts the budget
  }

  test("dupAwareWeights: families share ~unit mass, singletons keep full weight") {
    val docs = (1L to 7L).toDF("doc_id")
    // {1,2,3} via transitive pairs, {5,6} direct, 4 and 7 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Sampling.dupAwareWeights(docs, "doc_id", pairs)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_n"),
         r.getAs[Long]("weight_micro"))).toMap
    assert(got(1L) === ((1L, 3L, 333333L)))
    assert(got(2L) === ((1L, 3L, 333333L)))
    assert(got(3L) === ((1L, 3L, 333333L)))
    assert(got(4L) === ((4L, 1L, 1000000L)))
    assert(got(5L) === ((5L, 2L, 500000L)))
    assert(got(6L) === ((5L, 2L, 500000L)))
    assert(got(7L) === ((7L, 1L, 1000000L)))
    // every doc present exactly once; per-family mass within 1 ulp of 1e6
    assert(got.keySet === (1L to 7L).toSet)
    got.values.groupBy(_._1).foreach { case (_, members) =>
      val mass = members.map(_._3).sum
      assert(mass <= 1000000L && mass > 1000000L - members.size,
        s"family mass $mass drifted from unit")
    }
  }
}
