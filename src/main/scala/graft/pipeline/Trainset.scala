package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.dedup.NearDup
import graft.ops.Windows
import graft.text.TextAnalysis

/** The end-to-end training-corpus builder: the LLM-data-pipeline operators
  * composed in their production order. Each stage is the library operator;
  * the exact-dedup output is materialized (localCheckpoint) because the
  * LSH stage and the anti-join back would otherwise re-derive the whole
  * filter chain per consumer.
  *
  *   language filter → quality gate → exact dedup (keep min id) →
  *   MinHash near-dup removal → deterministic per-source sampling
  *
  * Scale shape: stages 1-3 are scan-speed narrow ops + one 16-byte-key
  * shuffle; near-dup removal is the banded LSH join (NearDup.minHashLsh);
  * sampling is one window. 100 TB in, curated sample out, every stage
  * deterministic → reruns build byte-identical corpora.
  */
object Trainset {

  /** Remove the higher-id member of every near-dup pair (keep-min-id
    * policy, transitively applied via left-anti join on the losers set).
    */
  def dropNearDups(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.9): DataFrame = {
    val losers = NearDup.minHashLsh(docs, idCol, textCol, threshold = threshold)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  def build(docs: DataFrame,
            langs: Set[String] = Set("en"),
            minQuality: Double = 0.5,
            nearDupThreshold: Double = 0.9,
            samplePerSource: Int = 100): DataFrame = {
    val filtered = docs
      .filter(col("lang").isin(langs.toSeq: _*))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)

    // Exact dedup as window keep-first on the content fingerprint:
    // rn=1 per md5(lower(text)) ordered by doc_id ≡ exactGroups'
    // min-id keeper, but as ONE pass over `filtered` (WindowGroupLimit
    // prunes the rank shuffle) instead of an agg + join-back that made
    // Catalyst re-derive the filter chain per consumer. Checkpointed
    // because the LSH stage consumes it three times (signatures + both
    // verification sides) and the anti-join reads it once more.
    val exactDeduped = filtered
      .withColumn("__rn", Windows.rowNumber(
        Seq(TextAnalysis.docFingerprint(col("text"))), Seq(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint()

    val nearDeduped = dropNearDups(exactDeduped, "doc_id", "text", nearDupThreshold)

    nearDeduped
      .withColumn("rk", Windows.rowNumber(Seq(col("source")),
        Seq(md5(to_binary(col("doc_id").cast(StringType), lit("utf-8"))), col("doc_id"))))
      .filter(col("rk") <= samplePerSource)
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      .select("doc_id", "source", "lang", "quality", "n_tokens", "rk")
  }
}
