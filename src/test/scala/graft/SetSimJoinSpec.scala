package graft

import org.apache.spark.sql.functions._

import graft.dedup.SetSimJoin

class SetSimJoinSpec extends SparkTestBase {
  import spark.implicits._

  // Brute-force ground truth: every pair, exact Jaccard on distinct tokens.
  private def bruteForce(df: org.apache.spark.sql.DataFrame, tNum: Int, tDen: Int) = {
    val toks = df.select(col("doc_id").cast("long").as("id"),
      array_remove(array_distinct(graft.text.TextAnalysis.tokens(col("text"))), "").as("toks"))
      .filter(size(col("toks")) > 0) // token-less docs out of contract (0/0 Jaccard)
    val a = toks.select(col("id").as("id_a"), col("toks").as("ta"))
    val b = toks.select(col("id").as("id_b"), col("toks").as("tb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("len_a", size(col("ta")).cast("long"))
      .withColumn("len_b", size(col("tb")).cast("long"))
      .filter(lit(tDen) * col("inter") >= lit(tNum) * (col("len_a") + col("len_b") - col("inter")))
      .select("id_a", "id_b", "inter", "len_a", "len_b")
  }

  test("handcrafted corpus: exact pair set, exact intersection sizes") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),        // 10 tokens
      (2L, "a b c d e f g h i k"),        // J(1,2) = 9/11 < 0.9
      (3L, "a b c d e f g h i j"),        // J(1,3) = 1.0
      (4L, "a b c d e f g h i j k"),      // J(1,4) = J(2,4) = 10/11 > 0.9
      (5L, "z y x w v u t s r q")         // disjoint
    ).toDF("doc_id", "text")
    val got = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 9, 10)
      .select("id_a", "id_b", "inter").orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 10L), (1L, 4L, 10L), (2L, 4L, 10L), (3L, 4L, 10L)))
  }

  test("no false negatives/positives vs brute force on real documents (t=0.9 and t=0.5)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 200)
    for ((tn, td) <- Seq((9, 10), (1, 2))) {
      val got = SetSimJoin.jaccardJoin(docs, "doc_id", "text", tn, td)
        .select("id_a", "id_b", "inter", "len_a", "len_b")
        .orderBy("id_a", "id_b").collect().toSeq
      val want = bruteForce(docs, tn, td).orderBy("id_a", "id_b").collect().toSeq
      assert(got === want, s"t=$tn/$td: prefix-filtered join diverged from brute force")
    }
  }

  test("empty and whitespace-only docs are out of contract: never paired, never crash") {
    val docs = Seq(
      (1L, ""),                   // zero tokens
      (2L, "   "),                // whitespace-only -> zero tokens
      (3L, "a b c"),
      (4L, "a b c")
    ).toDF("doc_id", "text")
    val got = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 1, 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    // the empty-empty pair (1,2) must NOT appear (0/0 Jaccard is
    // undefined, excluded by the len > 0 contract filter), and empty
    // docs must not pair with anything else either
    assert(got === Seq((3L, 4L)))
  }

  test("threshold acceptance is integer-exact at the boundary") {
    // J = 0.9 exactly: inter=9, union=10 -> lens 9,10? inter=9, len_a=9,
    // len_b=10, union=10 -> J=0.9: boundary pair MUST be kept at t=0.9.
    val docs = Seq(
      (1L, "a b c d e f g h i"),
      (2L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    val got = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 9, 10).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("inter") === 9L)
  }

  test("plan: no cartesian, no nested-loop over data; joins are hash on token/id") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 9, 10)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
