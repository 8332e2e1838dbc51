package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion: combine two rankings of the same item
  * space — lexical ([[graft.text.Bm25]]) and semantic ([[Ann]]) — by
  * Reciprocal Rank Fusion, `rrf(d) = Σ_r 1/(rrfK + rank_r(d))`, the
  * standard score-free fusion rule (robust to incomparable score scales,
  * which is exactly the BM25-vs-cosine situation).
  *
  * Scale shape: both inputs are already top-k tables — |Q|·k rows each —
  * so the full-outer join on (qid, id) and the per-query re-rank window
  * are small next to the retrieval passes that produced them; the fusion
  * adds no pass over corpus data. Determinism: ranks are integers, each
  * reciprocal is one exact double division, the two-term sum has a fixed
  * operand order, and re-ranking compares the ROUNDed score with an id
  * tie-break — externally replayable like every ranking in this module.
  */
object Fusion {

  /** Fuse rankings `a` and `b` (columns qid, id, rank) to top-`k` per
    * qid. Output: (qid, rank, id, rrf, rank_a, rank_b); an item missing
    * from one ranking contributes 0 from that side and keeps a NULL rank
    * column — the caller can see which retriever surfaced it.
    */
  def rrf(a: DataFrame, b: DataFrame, k: Int, rrfK: Int = 60): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rrfK >= 0, s"rrfK=$rrfK must be >= 0")
    val l = a.select(col("qid"), col("id"), col("rank").as("rank_a"))
    val r = b.select(col("qid"), col("id"), col("rank").as("rank_b"))
    val fused = l.join(r, Seq("qid", "id"), "full_outer")
      .select(col("qid"), col("id"), col("rank_a"), col("rank_b"),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_b")), lit(0.0)), 6).as("rrf"))
    val w = Window.partitionBy("qid").orderBy(col("rrf").desc, col("id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("rrf"),
        col("rank_a"), col("rank_b"))
  }
}
