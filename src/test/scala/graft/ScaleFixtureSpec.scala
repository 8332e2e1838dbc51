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
}
