package graft

import org.apache.spark.sql.functions.{col, expr}

import graft.similarity.Pca

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private val S = 1L << 18

  // HALF_UP away-from-zero, matching Spark/DuckDB ROUND (math.round
  // rounds -0.5 toward +inf — wrong side for negatives)
  private def halfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  // 3-dim corpus whose variance is overwhelmingly along (3, 4, 0)/5:
  // points at t·(3,4,0)/5 for spread t, plus tiny off-axis jitter on z.
  private lazy val lineCorpus = Seq(
    (0L, Array(0.60f, 0.80f, 0.01f)),
    (1L, Array(-0.60f, -0.80f, -0.01f)),
    (2L, Array(0.30f, 0.40f, 0.02f)),
    (3L, Array(-0.30f, -0.40f, 0.00f)),
    (4L, Array(0.48f, 0.64f, -0.01f)),
    (5L, Array(-0.48f, -0.64f, 0.01f))
  ).toDF("vec_id", "embedding")

  test("topComponentFx recovers a dominant direction: loadings ∝ (3, 4, ~0)") {
    val v = Pca.topComponentFx(lineCorpus, dim = 3)
    // dominant dim (y, loading 4/5) is positive by the sign rule
    assert(v(1) > 0)
    // ratio x/y = 3/4 within fixed-point tolerance
    assert(math.abs(v(0).toDouble / v(1).toDouble - 0.75) < 1e-3)
    // z loading is noise-sized relative to the dominant axis
    assert(math.abs(v(2).toDouble / v(1).toDouble) < 0.05)
    // renormalization contract: max |loading| is exactly the scale
    assert(v.map(math.abs).max === S)
  }

  test("component is bit-identical at any parallelism") {
    val a = Pca.topComponentFx(lineCorpus.repartition(1), dim = 3)
    val b = Pca.topComponentFx(lineCorpus.repartition(7), dim = 3)
    assert(a === b)
  }

  test("sign rule: the largest-|loading| dimension is positive") {
    // same corpus negated — the subspace is identical, so the signed
    // component must come out the same
    val neg = lineCorpus.select(col("vec_id"),
      expr("transform(embedding, x -> -x)").as("embedding"))
    val a = Pca.topComponentFx(lineCorpus, dim = 3)
    val b = Pca.topComponentFx(neg, dim = 3)
    assert(a === b)
    assert(a(a.map(math.abs).zipWithIndex.maxBy(_._1)._2) > 0)
  }

  test("meansFx: truncating signed division (negative sums round toward zero)") {
    // 3 rows, dim 1: fx = round(v·2^18): -1, -1, 0 → sum -2, n 3 → mfx 0
    val df = Seq(
      (0L, Array(-1.0f / S)), (1L, Array(-1.0f / S)), (2L, Array(0.0f))
    ).toDF("vec_id", "embedding")
    val m = Pca.meansFx(df).collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(m.toSeq === Seq((0, 0L)))
    // and with a sum that does divide: -3 / 3 = -1
    val df2 = Seq(
      (0L, Array(-1.0f / S)), (1L, Array(-1.0f / S)), (2L, Array(-1.0f / S))
    ).toDF("vec_id", "embedding")
    val m2 = Pca.meansVec(df2, dim = 1)
    assert(m2 === Seq(-1L))
  }

  test("covarianceFx: hand-computed 2-dim integer entries") {
    // two rows: (1, 2) and (-1, -2) in raw units of 2^-18 → means 0,
    // cov = [[2, 4], [4, 8]] exactly (upper triangle)
    val df = Seq(
      (0L, Array(1.0f / S, 2.0f / S)),
      (1L, Array(-1.0f / S, -2.0f / S))
    ).toDF("vec_id", "embedding")
    val means = Pca.meansVec(df, dim = 2)
    assert(means === Seq(0L, 0L))
    val cov = Pca.covarianceFx(df, means).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2).longValueExact()).toMap
    assert(cov === Map((0, 0) -> 2L, (0, 1) -> 4L, (1, 1) -> 8L))
  }

  test("projectFx equals the manual centered dot product") {
    val means = Pca.meansVec(lineCorpus, dim = 3)
    val comp = Pca.topComponentFx(lineCorpus, dim = 3)
    val rows = lineCorpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = Pca.projectFx(lineCorpus, means, comp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, xs) =>
      val expected = xs.indices.map { i =>
        (halfAway(xs(i).toDouble * S) - means(i)) * comp(i)
      }.sum
      assert(got(id) === expected, s"vec $id")
    }
  }

  test("projection separates the line ends: monotone in t along the axis") {
    val proj = Pca.fitProject(spark, lineCorpus, dim = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // t-order: 1 (-1.0) < 3 (-0.5) < 5 (-0.8)... actual t values:
    // id0 t=1.0, id1 t=-1.0, id2 t=0.5, id3 t=-0.5, id4 t=0.8, id5 t=-0.8
    val byT = Seq(1L -> -1.0, 5L -> -0.8, 3L -> -0.5, 2L -> 0.5, 4L -> 0.8, 0L -> 1.0)
    val projs = byT.map { case (id, _) => proj(id) }
    assert(projs === projs.sorted, s"projections not monotone: $projs")
  }

  test("moment segments: union-of-segments component ≡ batch component, bit-for-bit") {
    val segPath = java.nio.file.Files.createTempDirectory("pca_seg").resolve("seg").toString
    Pca.writeMomentSegments(lineCorpus.filter(col("vec_id") % 2 === 0), dim = 3, segPath)
    Pca.writeMomentSegments(lineCorpus.filter(col("vec_id") % 2 =!= 0), dim = 3, segPath)
    val merged = Pca.componentFromMomentSegments(spark, segPath, dim = 3)
    val batch = Pca.topComponentFx(lineCorpus, dim = 3)
    assert(merged === batch)
    // appending a third segment (a re-weighted slice) still matches the
    // batch run over the corresponding union
    Pca.writeMomentSegments(lineCorpus.filter(col("vec_id") < 2), dim = 3, segPath)
    val merged3 = Pca.componentFromMomentSegments(spark, segPath, dim = 3)
    val batch3 = Pca.topComponentFx(
      lineCorpus.unionByName(lineCorpus.filter(col("vec_id") < 2)), dim = 3)
    assert(merged3 === batch3)
  }

  test("momentSegment: homogeneous slot carries count, first and second moments") {
    // two rows (1, 2) and (-1, -2) in raw 2^-18 units: n = 2, sums 0,
    // second moments [[2, 4], [4, 8]]
    val df = Seq(
      (0L, Array(1.0f / S, 2.0f / S)),
      (1L, Array(-1.0f / S, -2.0f / S))
    ).toDF("vec_id", "embedding")
    val m = Pca.momentSegment(df, dim = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2).longValueExact()).toMap
    assert(m === Map(
      (0, 0) -> 2L, (0, 1) -> 4L, (1, 1) -> 8L, // Σ fx_i·fx_j
      (0, 2) -> 0L, (1, 2) -> 0L,               // Σ fx_i
      (2, 2) -> 2L))                            // n
  }

  test("moment segments: batch_id-keyed write is retry-idempotent") {
    val segPath = java.nio.file.Files.createTempDirectory("pca_seg2").resolve("seg").toString
    Pca.writeMomentSegments(lineCorpus, dim = 3, segPath, batchId = Some(0L))
    val once = Pca.componentFromMomentSegments(spark, segPath, dim = 3)
    // simulated sink-side retry of the same micro-batch: dynamic
    // overwrite replaces batch_id=0 instead of double-appending
    Pca.writeMomentSegments(lineCorpus, dim = 3, segPath, batchId = Some(0L))
    val twice = Pca.componentFromMomentSegments(spark, segPath, dim = 3)
    assert(once === twice)
    assert(once === Pca.topComponentFx(lineCorpus, dim = 3))
  }

  test("modelFromMomentSegments: projecting a new batch needs no history re-read") {
    val segPath = java.nio.file.Files.createTempDirectory("pca_model").resolve("seg").toString
    Pca.writeMomentSegments(lineCorpus, dim = 3, segPath)
    val (means, comp) = Pca.modelFromMomentSegments(spark, segPath, dim = 3)
    assert(means === Pca.meansVec(lineCorpus, dim = 3))
    assert(comp === Pca.topComponentFx(lineCorpus, dim = 3))
    // projection of a "new batch" under the segment-trained model equals
    // the batch-trained projection
    val fromSeg = Pca.projectFx(lineCorpus, means, comp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Pca.fitProject(spark, lineCorpus, dim = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromSeg === batch)
  }

  test("embeddingDrift: a constant dimension yields NULL z, not a job abort") {
    val a = Seq((0L, Array(1.0f / S, 5.0f / S)), (1L, Array(3.0f / S, 5.0f / S)))
      .toDF("vec_id", "embedding")
    val b = Seq((2L, Array(2.0f / S, 5.0f / S)), (3L, Array(4.0f / S, 5.0f / S)))
      .toDF("vec_id", "embedding")
    val rows = Pca.embeddingDrift(
      Pca.momentSegment(a, dim = 2), Pca.momentSegment(b, dim = 2), dim = 2)
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    assert(rows(1) === None)     // dim1 constant on both sides
    assert(rows(0).isDefined)    // dim0 varies: a real z
  }

  test("embeddingDrift: a NEAR-constant dimension saturates at ±1e15 micro, not an ANSI abort") {
    // dim0: one-quantum variance on side A (fx 0,1,0), side B constant at
    // 4096 (fx 2^30) — z ≈ −2^30/sqrt(2/27) ≈ −3.9e9 exceeds the ±1e9
    // saturation bound; the monitor must report a saturated ±1e15 micro,
    // never NULL (that means "no variance") and never an ANSI
    // CAST_OVERFLOW job abort on a pathological epoch pair
    val big = 4096.0f // exact as a float; fx = 2^30 keeps moment products in LONG range
    val a = Seq(
      (0L, Array(0.0f, 1.0f)), (1L, Array(1.0f / S, 1.0f)),
      (2L, Array(0.0f, 3.0f))) // dim1 varies: a normal z alongside
      .toDF("vec_id", "embedding")
    val b = Seq(
      (3L, Array(big, 1.0f)), (4L, Array(big, 1.0f)),
      (5L, Array(big, 3.0f)))
      .toDF("vec_id", "embedding")
    val z = Pca.embeddingDrift(
      Pca.momentSegment(a, dim = 2), Pca.momentSegment(b, dim = 2), dim = 2)
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    assert(z(0) === Some(-1000000000000000L)) // saturated at −1e15 micro, sign kept
    assert(z(1).exists(v => math.abs(v) < 1000000000000000L))
  }

  test("dimCorrelationFromMoments: ±1 on designed (anti)correlated dims, NULL on constant") {
    // dim1 = 2·dim0 (corr +1), dim2 = −dim0 (corr −1), dim3 constant (NULL)
    val df = Seq(
      (0L, Array(1.0f / S, 2.0f / S, -1.0f / S, 5.0f / S)),
      (1L, Array(2.0f / S, 4.0f / S, -2.0f / S, 5.0f / S)),
      (2L, Array(4.0f / S, 8.0f / S, -4.0f / S, 5.0f / S))
    ).toDF("vec_id", "embedding")
    val c = Pca.dimCorrelationFromMoments(Pca.momentSegment(df, dim = 4), dim = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(c((0, 1)) === Some(1000000L))
    assert(c((0, 2)) === Some(-1000000L))
    assert(c((0, 3)) === None)
    assert(c((1, 2)) === Some(-1000000L))
    assert(c.size === 6) // all C(4,2) pairs present
  }

  test("dimStats recovers count / Σfx / Σfx² from the moment table") {
    // rows (1, 2) and (3, 4) in raw 2^-18 units
    val df = Seq(
      (0L, Array(1.0f / S, 2.0f / S)),
      (1L, Array(3.0f / S, 4.0f / S))
    ).toDF("vec_id", "embedding")
    val st = Pca.dimStats(Pca.momentSegment(df, dim = 2), dim = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getDecimal(3).longValueExact(), r.getDecimal(1).longValueExact(),
          r.getDecimal(2).longValueExact()))).toMap
    // (n, s1, s2): dim0 sums 1+3=4, 1+9=10; dim1 sums 2+4=6, 4+16=20
    assert(st(0) === ((2L, 4L, 10L)))
    assert(st(1) === ((2L, 6L, 20L)))
  }

  test("embeddingDrift: zero shift on identical epochs; hand-computed z on a designed one") {
    val a = Seq(
      (0L, Array(1.0f / S, 8.0f / S)), (1L, Array(3.0f / S, 8.0f / S)),
      (2L, Array(1.0f / S, 12.0f / S)), (3L, Array(3.0f / S, 12.0f / S))
    ).toDF("vec_id", "embedding")
    val same = Pca.embeddingDrift(
      Pca.momentSegment(a, dim = 2), Pca.momentSegment(a, dim = 2), dim = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(5)).toMap
    assert(same === Map(0 -> 0L, 1 -> 0L))
    // epoch B shifts dim0 by +2 units, leaves dim1: z0 = 2/sqrt(1/4+1/4)
    // = 2/sqrt(.5), z1 = 0 (means 10 vs 10, var 4 both sides)
    val b = Seq(
      (0L, Array(3.0f / S, 8.0f / S)), (1L, Array(5.0f / S, 8.0f / S)),
      (2L, Array(3.0f / S, 12.0f / S)), (3L, Array(5.0f / S, 12.0f / S))
    ).toDF("vec_id", "embedding")
    val z = Pca.embeddingDrift(
      Pca.momentSegment(b, dim = 2), Pca.momentSegment(a, dim = 2), dim = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(5)).toMap
    assert(z(1) === 0L)
    assert(z(0) === math.round(2.0 / math.sqrt(0.5) * 1e6))
  }

  test("componentFromMomentSegments on an EMPTY segment set fails loudly") {
    val segPath = java.nio.file.Files.createTempDirectory("pca_empty").resolve("seg").toString
    Pca.writeMomentSegments(lineCorpus.filter(col("vec_id") < -1), dim = 3, segPath)
    // an all-empty write leaves no parquet files: the read itself is the
    // loud failure (schema inference); segments PRESENT but zero-row is
    // the require(n > 0) layer
    intercept[Exception] {
      Pca.componentFromMomentSegments(spark, segPath, dim = 3)
    }
  }

  test("component improves the Rayleigh quotient over the seed axis") {
    // on the real embeddings fixture: quotient v'Cv / v'v of the trained
    // component must be >= that of the best coordinate axis (the seed) —
    // power iteration can only go up
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = 64
    val means = Pca.meansVec(emb, dim)
    val cov = Array.ofDim[BigInt](dim, dim)
    for (i <- 0 until dim; j <- 0 until dim) cov(i)(j) = BigInt(0)
    Pca.covarianceFx(emb, means).collect().foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), BigInt(r.getDecimal(2).toBigInteger))
      cov(i)(j) = v; cov(j)(i) = v
    }
    def rayleigh(v: Seq[BigInt]): Double = {
      val num = (0 until dim).map(i =>
        (0 until dim).map(j => cov(i)(j) * v(i) * v(j)).sum).sum
      val den = v.map(x => x * x).sum
      (BigDecimal(num) / BigDecimal(den)).toDouble
    }
    val comp = Pca.topComponentFx(emb, dim).map(BigInt(_))
    val bestAxis = (0 until dim).map { a =>
      rayleigh((0 until dim).map(i => if (i == a) BigInt(1) else BigInt(0)))
    }.max
    assert(rayleigh(comp) >= bestAxis,
      s"rayleigh(comp)=${rayleigh(comp)} < best axis $bestAxis")
  }
}
