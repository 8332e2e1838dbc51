package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication" —
  * public): cluster the embedding corpus with k-means, then deduplicate
  * ONLY within clusters — two documents are semantic duplicates when
  * their embedding cosine exceeds a threshold, and the cluster structure
  * bounds the quadratic pair search to cell-local work.
  *
  * Relationship to [[Ann.embeddingNearDups]]: that operator buckets by
  * random hyperplanes (SRP — recall-oriented, near-dups can straddle
  * buckets); this one buckets by learned centroids, the published
  * SemDeDup formulation, and goes one step further: it resolves the pair
  * graph to a deterministic KEEP/DROP verdict per document.
  *
  * Drop rule (deterministic, recursion-free): within a cell, every
  * over-threshold pair (a < b) drops the HIGHER id; survivors are ids
  * never dropped. Transitively safe — any duplicate pair loses its
  * higher member, so each duplicate group keeps exactly its minimum id
  * (ties cannot strand: the group minimum is never the greater side of
  * any pair). An external engine replays this as a DISTINCT over pair
  * right-sides — no fixpoint needed, unlike connected components.
  *
  * Scale shape: centroid assignment is one broadcast of k centroids +
  * a codegen'd argmax pass (NO shuffle of the vectors — [[Ivf
  * .buildIndex]]); the pair self-join shuffles each vector once on its
  * cell id; oversize cells (> `maxCell`, degenerate centroids) are
  * excluded from pair search — their members are all KEPT, the honest
  * cap (same contract as [[Ann.embeddingNearDups]]'s bucket cap: never
  * corpus², loudly bounded). The drop list is a distinct-aggregate of
  * pair right-sides, and the verdict join-back runs on the id
  * partitioning.
  */
object SemDedup {

  /** Within-cell over-threshold cosine pairs. Cosines are ROUNDed to 6
    * decimals before the compare (cross-engine replayability; the
    * fixed-point discipline).
    *
    * Output: (cell, id_a, id_b, cosine) with id_a < id_b, each pair
    * exactly once (one cell per id).
    */
  def semanticPairs(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
                    threshold: Double, maxCell: Int = 4000,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pairsFromIndex(Ivf.buildIndex(corpus, cents, idCol, vecCol), threshold, maxCell)

  /** [[semanticPairs]] over a pre-built assignment ([[Ivf.buildIndex]]
    * schema: cid, cvec, cell, cn). At scale, MATERIALIZE the index once
    * (persist, or write bucketed by cell) and feed it here — the
    * centroid-argmax pass over the corpus is the expensive stage, and
    * every DataFrame branch below re-executes its input plan.
    */
  def pairsFromIndex(idx: DataFrame, threshold: Double, maxCell: Int = 4000): DataFrame = {
    require(maxCell >= 2, s"maxCell=$maxCell must be >= 2")
    val sizes = idx.groupBy("cell").count()
    val capped = idx.join(
      sizes.filter(col("count") <= maxCell).select("cell"), Seq("cell"))
    val l = capped.select(col("cell"), col("cid").as("id_a"),
      col("cvec").as("va"), col("cn").as("na"))
    val r = capped.select(col("cell"), col("cid").as("id_b"),
      col("cvec").as("vb"), col("cn").as("nb"))
    l.join(r, "cell")
      .filter(col("id_a") < col("id_b"))
      .select(col("cell"), col("id_a"), col("id_b"),
        round(VectorOps.cosineFromParts(
          VectorOps.dot(col("va"), col("vb")), col("na"), col("nb")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Full per-document verdict: (id, cell, kept). `kept = false` iff the
    * id is the greater side of any over-threshold within-cell pair.
    * Total over the corpus — gates filter on `kept`, audits read the
    * drop rate per cell. The assignment expression is built ONCE and
    * shared by the pair branches and the verdict join-back.
    */
  def dedupReport(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
                  threshold: Double, maxCell: Int = 4000,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    reportFromIndex(Ivf.buildIndex(corpus, cents, idCol, vecCol), threshold, maxCell)

  /** [[dedupReport]] over a pre-built assignment — see [[pairsFromIndex]]
    * for when to persist the index first.
    */
  def reportFromIndex(idx: DataFrame, threshold: Double, maxCell: Int = 4000): DataFrame = {
    val drops = pairsFromIndex(idx, threshold, maxCell)
      .select(col("id_b").as("id")).distinct()
      .withColumn("__dropped", lit(true))
    idx.select(col("cid").as("id"), col("cell"))
      .join(drops, Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(!col("__dropped"), lit(true)).as("kept"))
  }

  /** Surviving rows only — the operator a training pipeline chains. */
  def survivors(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
                threshold: Double, maxCell: Int = 4000,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val drops = semanticPairs(corpus, cents, threshold, maxCell, idCol, vecCol)
      .select(col("id_b").as(idCol)).distinct()
    corpus.join(drops, Seq(idCol), "left_anti")
  }
}
