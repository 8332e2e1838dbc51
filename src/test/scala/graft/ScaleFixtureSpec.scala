package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleFixture

/** Pins the soak-fixture replication semantics ([[graft.tools
  * .ScaleFixture.scaled]]) — the instrument every BASELINE.md soak row
  * is measured with. If replication silently broke FK consistency or
  * dup-group isolation, soak verdicts would measure the fixture bug,
  * not the operator.
  */
class ScaleFixtureSpec extends SparkTestBase {
  import spark.implicits._

  test("keys shift by a common stride: FKs join within a replica, never across") {
    val orders = Seq((1L, 10L), (2L, 20L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((10L, "a"), (20L, "b")).toDF("c_custkey", "c_name")
    val o4 = ScaleFixture.scaled(orders, 4, 0, 0)
    val c4 = ScaleFixture.scaled(cust, 4, 0, 0)
    assert(o4.count() === 8 && c4.count() === 8)
    val joined = o4.join(c4, $"o_custkey" === $"c_custkey")
    assert(joined.count() === 8, "every order matches exactly one replica-local customer")
    // key cardinality scales with the data — no artificially hot keys
    assert(c4.select("c_custkey").distinct().count() === 8)
  }

  test("embedding rotation is norm-preserving and replica-distinct; replica 0 is identity") {
    val emb = Seq((1L, Array(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
    val rows = ScaleFixture.scaled(emb, 3, 4, 0)
      .orderBy("vec_id")
      .select("embedding").as[Array[Float]].collect()
    assert(rows(0).sameElements(Array(1f, 2f, 3f, 4f)), "replica 0 unchanged")
    assert(rows(1).sameElements(Array(2f, 3f, 4f, 1f)), "replica 1 rotated by 1")
    assert(rows.forall(v => v.map(x => x * x).sum === 30f), "rotation preserves the norm")
  }

  test("textDupDepth pins duplication depth: D verbatim copies per group, zero 3-gram overlap across groups") {
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = ScaleFixture.scaled(docs, 6, 0, 3)
      .orderBy("doc_id").select("text").as[String].collect()
    // groups: replicas 0-2 → group 0, replicas 3-5 → group 1
    assert(out.take(3).distinct.length === 1, "within-group copies are verbatim")
    assert(out(0) !== out(3), "across groups the text differs")
    def grams3(s: String): Set[Seq[String]] =
      s.split("\\s+").toSeq.sliding(3).toSet
    assert(grams3(out(0)).intersect(grams3(out(3))).isEmpty,
      "salt token sits in every word 3-gram → zero shingle overlap across groups")
    // depth is constant by construction: 6 replicas / depth 3 = 2 groups
    assert(out.distinct.length === 2)
  }

  test("verbatim default (textDupDepth=0) leaves text untouched") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val out = ScaleFixture.scaled(docs, 3, 0, 0)
      .select("text").as[String].collect()
    assert(out.forall(_ === "alpha beta"))
  }

  test("zipf vocab mode: token counts preserved, long-tail vocab, deterministic, replica-distinct") {
    val docs = (0L until 40L)
      .map(i => (i, ("tok " * 50).trim)).toDF("doc_id", "text")
    val out = ScaleFixture.scaled(docs, 2, 0, 0, vocabSize = 50000)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(out.length === 80)
    // token counts survive exactly (dl/budget distributions unchanged)
    assert(out.forall(_._2.split("\\s+").length === 50))
    // all tokens come from the synthetic vocabulary
    val toks = out.flatMap(_._2.split("\\s+"))
    assert(toks.forall(t => t.matches("w\\d+")))
    val ranks = toks.map(_.drop(1).toLong)
    assert(ranks.forall(r => r >= 1 && r <= 50000))
    // log-uniform ranks → heavy head AND a long tail: rank 1..10 tokens
    // appear many times, while most of the 4000 positions are rare types
    val nLow = ranks.count(_ <= 10)
    assert(nLow > 400, s"zipf head too light: $nLow/4000 positions at rank<=10")
    assert(ranks.distinct.length > 500,
      s"vocabulary too small: ${ranks.distinct.length} types over 4000 positions")
    // deterministic: a re-run is bit-identical
    val again = ScaleFixture.scaled(docs, 2, 0, 0, vocabSize = 50000)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(out.sortBy(_._1).map(_._2).toSeq === again.sortBy(_._1).map(_._2).toSeq)
    // replicas get distinct text (the hash keys on the replica index)
    val byBase = out.groupBy(_._1 % 1000000000000L)
    assert(byBase.values.forall(g => g.map(_._2).distinct.length === g.length))
  }
}
