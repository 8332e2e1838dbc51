package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Trainset

class TrainsetSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("build: filters, gates, dedups, samples — all invariants hold") {
    val out = Trainset.build(docs, langs = Set("en", "de"),
      minQuality = 0.3, nearDupThreshold = 0.95, samplePerSource = 5).cache()

    assert(out.count() > 0)
    // language filter
    assert(out.select("lang").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("en", "de")))
    // quality gate
    assert(out.filter($"quality" < 0.3).count() === 0)
    // sample bound per source
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= 5))
    // deterministic: rebuilding yields the identical corpus
    val again = Trainset.build(docs, langs = Set("en", "de"),
      minQuality = 0.3, nearDupThreshold = 0.95, samplePerSource = 5)
    assert(out.exceptAll(again).count() === 0)
    assert(again.exceptAll(out).count() === 0)
  }

  test("dropNearDups removes the higher id of a planted duplicate pair") {
    val planted = docs.select($"doc_id", $"text", $"lang", $"source")
      .unionByName(docs.filter($"doc_id" === 3)
        .select(($"doc_id" + 10000).as("doc_id"), $"text", $"lang", $"source"))
    val out = Trainset.dropNearDups(planted, "doc_id", "text", threshold = 0.99)
    assert(out.filter($"doc_id" === 3).count() === 1, "original survives")
    assert(out.filter($"doc_id" === 10003).count() === 0, "clone dropped")
  }
}
