package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomMightContainLong
import graft.text.Decontaminate

class BloomDecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  test("BloomMightContainLong: no false negatives; some keys rejected") {
    val keys = (0L until 1000L).toDF("k")
    val bloom = keys.stat.bloomFilter("k", 1000L, 0.03)
    val inSet = keys.filter(BloomMightContainLong.mightContain(col("k"), bloom)).count()
    assert(inSet === 1000L) // a Bloom filter never false-negatives
    val outside = (100000L until 110000L).toDF("k")
      .filter(BloomMightContainLong.mightContain(col("k"), bloom)).count()
    // ~3% fpp on 10k disjoint keys: far below all, above none is suspicious
    assert(outside < 2000L, s"fpp implausibly high: $outside/10000")
  }

  test("bloomFlagContaminated == flagContaminated, row for row") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter(col("doc_id") < 80)
    val bench = docs.filter(col("doc_id") >= 80)
    val exact = Decontaminate.flagContaminated(train, bench, "doc_id", "text",
      n = 3, minHits = 5).orderBy("id").collect()
    val bloomed = Decontaminate.bloomFlagContaminated(train, bench, "doc_id", "text",
      n = 3, minHits = 5, fpp = 0.01).orderBy("id").collect()
    assert(exact.length === bloomed.length)
    exact.zip(bloomed).foreach { case (e, b) => assert(e === b) }
  }

  test("bloomFlagContaminated releases its cache — no leaked blocks") {
    // regression: the benchmark-gram cache used for sizing + sketch build
    // must be dropped before the call returns — a long-lived session
    // calling this per-batch would otherwise accumulate cached blocks
    // with no release handle. Snapshot-diff because the suite session is
    // shared (other suites may legitimately hold caches).
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rep = Decontaminate.bloomFlagContaminated(
      docs.filter(col("doc_id") < 80), docs.filter(col("doc_id") >= 80),
      "doc_id", "text", n = 3, minHits = 5, fpp = 0.01)
    assert(spark.sparkContext.getPersistentRDDs.keySet === before,
      "cache must be released before the call returns")
    assert(rep.count() > 0) // and the returned (recomputing) plan still runs
    assert(spark.sparkContext.getPersistentRDDs.keySet === before,
      "execution of the returned plan must not resurrect the cache")
  }

  test("bloom false positives never reach the report (exact confirm)") {
    // adversarial fpp: at 0.5 the prefilter passes ~half of everything,
    // so the exact-confirm join is what keeps the output correct
    val train = Seq((1L, "a b c d e"), (2L, "p q r s t")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c x y")).toDF("doc_id", "text")
    val rep = Decontaminate.bloomFlagContaminated(train, bench, "doc_id", "text",
      n = 3, minHits = 1, fpp = 0.5).orderBy("id").collect()
    assert(rep(0).getAs[Long]("n_hits") === 1L)  // "a b c" only
    assert(rep(0).getAs[Boolean]("contaminated"))
    assert(rep(1).getAs[Long]("n_hits") === 0L)  // no shared gram, whatever the bloom says
    assert(!rep(1).getAs[Boolean]("contaminated"))
  }
}
