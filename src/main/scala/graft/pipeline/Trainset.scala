package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.dedup.NearDup
import graft.ops.Windows
import graft.text.TextAnalysis

/** The end-to-end training-corpus builder: the LLM-data-pipeline operators
  * composed in their production order. Each stage is the library operator;
  * the composition stays one lazy plan until the (optional) near-dup join.
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

    val exactDeduped = {
      val keepers = NearDup.exactGroups(filtered, "doc_id", "text")
        .select(col("keeper_id").as("doc_id"))
      filtered.join(keepers, "doc_id") // semi-join on the hash-group winners
    }

    val nearDeduped = dropNearDups(exactDeduped, "doc_id", "text", nearDupThreshold)

    nearDeduped
      .withColumn("rk", Windows.rowNumber(Seq(col("source")),
        Seq(md5(to_binary(col("doc_id").cast(StringType), lit("utf-8"))), col("doc_id"))))
      .filter(col("rk") <= samplePerSource)
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      .select("doc_id", "source", "lang", "quality", "n_tokens", "rk")
  }
}
