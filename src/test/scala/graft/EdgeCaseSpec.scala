package graft

import org.apache.spark.sql.functions._

import graft.dedup.NearDup
import graft.ops.{Cleansing, Dedup, Windows}
import graft.pipeline.{Schemas, Transform}

/** Distributed-correctness and degenerate-input behavior: results must not
  * depend on physical partitioning, and empty/pathological inputs must not
  * crash — on a 1000-executor cluster both happen constantly.
  */
class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  test("operators are partition-invariant") {
    val base = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Seq(1, 7, 32).foreach { n =>
      val df = base.repartition(n)
      // keyed dedup: deterministic tie-break → same survivors at any layout
      val kept = Dedup.keepFirst(df, Seq("l_orderkey"),
        Seq($"l_linenumber", $"l_partkey", $"l_suppkey"))
        .agg(sum(col("l_partkey")), count(lit(1))).head()
      assert(kept === Dedup.keepFirst(base, Seq("l_orderkey"),
        Seq($"l_linenumber", $"l_partkey", $"l_suppkey"))
        .agg(sum(col("l_partkey")), count(lit(1))).head(), s"n=$n")
    }

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = NearDup.minHashLsh(docs, "doc_id", "text", threshold = 0.9)
      .orderBy("id_a", "id_b").collect().toSeq
    val repart = NearDup.minHashLsh(docs.repartition(11), "doc_id", "text", threshold = 0.9)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(ref === repart, "LSH pairs must not depend on partitioning")
  }

  test("empty inputs flow through the full v1/v2 chains") {
    val emptyV1 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.rawV1)
    val outV1 = Transform.transformV1(emptyV1)
    assert(outV1.count() === 0)
    // schema still has the analytic columns
    assert(outV1.columns.contains("mean_part_7_days"))

    val emptyV2 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.rawV2)
    assert(Transform.transformV2(emptyV2).count() === 0)
  }

  test("empty input: dedup, windows, minhash do not crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(NearDup.minHashLsh(empty, "doc_id", "text").count() === 0)
    assert(NearDup.exactGroups(empty, "doc_id", "text").count() === 0)
    assert(NearDup.simHash(empty, "doc_id", "text").count() === 0)

    val emptyNum = Seq.empty[(String, Int, Double)].toDF("k", "i", "v")
    val w = Windows.rolling(Seq($"k"), Seq($"i"), 7)
    assert(emptyNum.select(Windows.rollingAvg($"v", w)).count() === 0)
  }

  test("single-token and empty-string documents survive text analysis") {
    import graft.text.TextAnalysis._
    val df = Seq((1L, "solo"), (2L, "a b"), (3L, "x y z"), (4L, ""))
      .toDF("doc_id", "text")
    val staged = df.select($"doc_id", $"text", tokens($"text").as("tk"))
      .select($"doc_id", shinglesFromTokens($"text", $"tk").as("sh"))
      .select($"doc_id", shingleFingerprintFromShingles($"sh").as("fp"))
    val fps = staged.orderBy("doc_id").collect().map(_.getString(1))
    assert(fps.forall(_.length === 32)) // short docs use whole-text fallback

    // ANSI mode: the empty doc must yield deterministic scores, not a
    // DIVIDE_BY_ZERO abort — one empty doc must never kill a corpus build.
    val scored = df.select($"doc_id",
        qualityScore($"text").as("q"), punctRatio($"text").as("p"))
      .orderBy("doc_id").collect()
    val empty = scored.find(_.getLong(0) == 4L).get
    assert(empty.getDouble(1) === 0.0) // quality gate filters it
    assert(empty.getDouble(2) === 0.0)
    assert(scored.forall(r => !r.isNullAt(1) && !r.getDouble(1).isNaN))
  }

  test("pruneAllNullColumns on an all-null frame keeps only essential") {
    val df = Seq((null: String, null: String), (null, null)).toDF("a", "b")
    val pruned = Cleansing.pruneAllNullColumns(df, essential = Set("b"))
    assert(pruned.columns.toSeq === Seq("b"))
  }

  test("HLL pairwiseOverlap: NULL keys drop out of the pair list; one key → no pairs") {
    import graft.ops.Hll
    val df = Seq(("a", "x"), ("a", "y"), (null: String, "z"), ("b", "x"))
      .toDF("k", "v")
    val out = Hll.pairwiseOverlap(Hll.registers(df, Seq("k"), "v"), "k").collect()
    // NULL never satisfies ka < kb, so NULL-keyed registers contribute
    // to no pair (the null-key guard is the caller's F1 job)
    assert(out.length === 1)
    assert(out(0).getAs[String]("ka") === "a" && out(0).getAs[String]("kb") === "b")
    val one = Hll.pairwiseOverlap(
      Hll.registers(Seq(("solo", "x")).toDF("k", "v"), Seq("k"), "v"), "k")
    assert(one.count() === 0)
  }

  test("unigram: NULL/empty text drops the doc (tokenizer family convention); 16/17-char boundary") {
    import graft.text.Unigram
    val docs = Seq((1L, "aaaaaaaaaaaaaaaa bb"), // 16-char word: admissible
      (2L, "aaaaaaaaaaaaaaaaa bb"),             // 17-char word: OOV whole-word
      (3L, null.asInstanceOf[String]), (4L, ""))
      .toDF("doc_id", "text")
    val v = Unigram.vocab(docs, "doc_id", "text", minCount = 1L)
    val out = Unigram.encode(docs, "doc_id", "text", v).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out.keySet === Set(1L, 2L)) // NULL and empty text vanish, as WordPiece
    assert(out(1L).replace(" ", "") === "aaaaaaaaaaaaaaaa" + "bb")
    assert(out(2L).contains("aaaaaaaaaaaaaaaaa")) // un-split OOV token
    val enc = Unigram.encodeWords(
      Seq("aaaaaaaaaaaaaaaaa").toDF("word"), v).collect()
    assert(enc.length === 1 && enc(0).getLong(2) === 1L &&
      enc(0).getLong(3) === Unigram.UnkScoreMicro)
  }

  test("logistic: docs without labels are ignored; single-class labels train without crashing") {
    import graft.text.LinearModel
    val feats = Seq((1L, 0L, 2L), (2L, 0L, 3L), (99L, 0L, 7L)) // 99 unlabeled
      .toDF("id", "bucket", "x")
    val labels = Seq((1L, 1), (2L, 1)).toDF("id", "y") // single class
    val w = LinearModel.trainLogistic(spark, feats, labels, iters = 2)
      .as[(Long, Long)].collect().toMap
    // all-positive labels: gradient is negative (p < 1 everywhere), so
    // weights strictly increase; the unlabeled doc contributed nothing
    assert(w(0L) > 0L)
    val w2 = LinearModel.trainLogistic(spark,
      feats.filter($"id" =!= 99L), labels, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(w === w2, "unlabeled docs must not affect training")
  }
}
