package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's tier map must stay total over the registry: a new query
  * landing in "other" means its regressions localize to a junk bucket.
  * (No SparkSession needed — the registry keys are static.)
  */
class BenchTierSpec extends AnyFunSuite {

  test("every registry query maps to a named tier, never 'other'") {
    val untiered = SparkEntry.queries.keys.filter(Bench.tierOf(_) == "other")
    assert(untiered.isEmpty,
      s"add these to Bench.tierOf: ${untiered.toSeq.sorted.mkString(", ")}")
  }

  test("tier spot checks") {
    assert(Bench.tierOf("q_s1_scan_filter") === "etl")
    assert(Bench.tierOf("q_token_budget") === "sampling")
    assert(Bench.tierOf("q_token_entropy") === "text")
    assert(Bench.tierOf("q_cdc_latest") === "streaming")
    assert(Bench.tierOf("q_bmp_decode") === "multimodal")
    assert(Bench.tierOf("q_dup_clusters_star") === "dedup_graph")
  }
}
