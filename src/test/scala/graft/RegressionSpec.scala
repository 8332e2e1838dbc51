package graft

import org.apache.spark.sql.functions._

import graft.functions.DotProduct
import graft.multimodal.Multimodal
import graft.ops.{AsOfJoin, Windows}

/** Regressions for review findings: each test pins a bug that shipped in
  * an earlier commit of this round.
  */
class RegressionSpec extends SparkTestBase {
  import spark.implicits._

  test("rolling median of an all-NULL frame is NULL, not a crash") {
    val df = Seq(("k", 1, None: Option[Double]), ("k", 2, None), ("k", 3, Some(5.0)))
      .toDF("k", "i", "v")
    val w = Windows.rolling(Seq($"k"), Seq($"i"), 2)
    val med = df.select($"i", Windows.rollingMedianExact($"v", w).as("m"))
      .orderBy("i").collect()
    assert(med(0).isNullAt(1), "frame [NULL] → NULL median")
    assert(med(1).isNullAt(1), "frame [NULL,NULL] → NULL median")
    assert(med(2).getDouble(1) === 5.0, "frame [NULL,5.0] → 5.0")
  }

  test("as-of join is deterministic when right has duplicate (key, time) rows") {
    val l = Seq(("k", 100L, 1)).toDF("k", "t", "id")
    val r = Seq(("k", 50L, 1.0), ("k", 50L, 9.0), ("k", 50L, 4.0)).toDF("k", "t", "px")
    val results = (1 to 3).map { n =>
      AsOfJoin.asOf(l, r.repartition(n), "k", "t", Seq("px")).head().getAs[Double]("px")
    }
    assert(results.distinct.size === 1, s"partitioning changed the result: $results")
    assert(results.head === 9.0, "ties resolve to the greatest payload (documented order)")
  }

  test("several DotProducts over non-nullable arrays codegen in one projection") {
    // array literals are non-nullable → all three expressions share one
    // codegen scope; fixed identifiers would fail janino and silently
    // fall back to interpreted eval
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val r = df.select(
      DotProduct.dot(array(lit(1.0), lit(0.0)), $"a").as("d1"),
      DotProduct.dot(array(lit(0.0), lit(1.0)), $"a").as("d2"),
      DotProduct.dot($"a", $"b").as("d3")).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 2.0)
    assert(r.getDouble(2) === 11.0)
  }

  test("dotHof widens float elements before multiplying (contract parity with dot)") {
    // product of large floats: float*float rounds differently than
    // double*double — the two formulations must agree on raw float arrays
    val df = Seq((Array(1.0000001f, 3.3333333f), Array(7.7777777f, 9.0000001f)))
      .toDF("a", "b")
    val r = df.select(
      DotProduct.dot($"a", $"b").as("fast"),
      graft.functions.VectorOps.dotHof($"a", $"b").as("ref")).head()
    assert(r.getDouble(0) === r.getDouble(1))
  }

  test("as-of join carries the matched right row atomically (NULL fields included)") {
    val l = Seq(("k", 2L, 1)).toDF("k", "t", "id")
    val r = Seq(
      ("k", 0L, Some(9.0), Some(5.0)),
      ("k", 1L, Some(10.0), None: Option[Double]) // latest row: qty is NULL
    ).toDF("k", "t", "price", "qty")
    val row = AsOfJoin.asOf(l, r, "k", "t", Seq("price", "qty")).head()
    assert(row.getAs[Double]("price") === 10.0)
    assert(row.isNullAt(row.fieldIndex("qty")),
      "qty must come from the SAME (latest) right row, not a stale one")
  }

  test("zero-norm embeddings never outrank real neighbors (NaN guard)") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 0.0f)) // failed-embedding artifact
    ).toDF("vec_id", "embedding")
    val top = graft.similarity.Ann.bruteForceTopK(
      corpus, corpus.filter($"vec_id" === 0), k = 2)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("cid") === 1L, "real neighbor must rank first")
    assert(top(1).isNullAt(top(1).fieldIndex("cosine")), "zero vector scores NULL")
    val dups = graft.similarity.Ann.embeddingNearDups(corpus, threshold = 0.5, dim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!dups.exists(p => p._1 == 2L || p._2 == 2L),
      "NaN must not pass the near-dup threshold")
  }

  test("sampleFrames: empty payload has zero frames") {
    val df = Seq((1L, ""), (2L, "abcdefgh")).toDF("doc_id", "text")
    val out = Multimodal.sampleFrames(
      Multimodal.withBinaryPayload(df, "text"), "payload", frameBytes = 4, stride = 1)
      .orderBy("doc_id").select("n_frames_sampled").collect()
    assert(out(0).getInt(0) === 0)
    assert(out(1).getInt(0) === 2)
  }

  test("rollingStddevExact widens integer columns before squaring") {
    // With IntegerType input, an unwidened c*c is 32-bit multiplication:
    // 50000² overflows int (ANSI error / silent wrap). The double-widened
    // form must return the exact sample stddev instead.
    val df = Seq((1, 50000), (1, 50002), (1, 50004))
      .toDF("k", "v")
    val w = Windows.rolling(Seq($"k"), Seq($"v"), 7)
    val out = df.withColumn("sd", Windows.rollingStddevExact($"v", w))
      .orderBy("v").select("sd").collect()
    assert(math.abs(out(2).getDouble(0) - 2.0) < 1e-9)
  }

  test("LSH hyperplane constants are pinned (oracle SQL embeds them)") {
    // q_ann_lsh_topk / q_embed_neardup embed these exact doubles into
    // their DuckDB oracle SQL. If the generator, seed handling, or default
    // params drift, this fails HERE instead of as a driver hash mismatch.
    val p = graft.similarity.Ann.hyperplanes(8, 64, 42L)
    assert(p.length === 8 && p.forall(_.length === 64))
    assert(p.head.head === 1.1419053154730547)
    assert(p.head(1) === 0.9194079489827879)
    assert(p(7)(63) === -0.5098969149356519)
    // and the same call twice yields identical planes (no hidden state)
    assert(graft.similarity.Ann.hyperplanes(8, 64, 42L) === p)
  }
}
