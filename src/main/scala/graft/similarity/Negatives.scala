package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.dedup.NearDup

/** Deterministic negative sampling for contrastive / embedding training —
  * given (query, positive) pairs, attach `k` negatives per query drawn
  * from a shared candidate pool (the "in-batch negatives" pattern).
  *
  * The naive contract ("k random corpus items per query, excluding
  * positives") is |Q|×|C| if sampled per query; the production shape is
  * a SHARED pool: one md5-bottom-m sample of the corpus (m ≪ |C|,
  * `TakeOrderedAndProject` — no global sort), broadcast against the
  * queries, accidental hits (the query itself, its true positives)
  * excluded, and the per-query k chosen by a second, query-SALTED md5
  * order — so each query sees a different k-subset of the pool while the
  * pool scan stays one pass over the corpus.
  *
  * Everything derives from md5 (no RNG): re-runs and external engines
  * reproduce the exact sample; growth of the corpus only perturbs the
  * pool membership at the md5 boundary, not wholesale.
  */
object Negatives {

  /** The shared candidate pool: the `poolSize` corpus ids with smallest
    * `md5(id)` — a uniform deterministic sample that plans as top-k, not
    * a global sort.
    */
  def negativePool(corpus: DataFrame, idCol: String, poolSize: Int): DataFrame = {
    require(poolSize > 0, s"poolSize=$poolSize must be positive")
    corpus.select(col(idCol).as("cand_id"))
      .withColumn("__prio", NearDup.md5Long(col("cand_id").cast(StringType)))
      .orderBy(col("__prio"), col("cand_id"))
      .limit(poolSize)
      .select("cand_id")
  }

  /** Attach `k` negatives per query: (qid, neg_id, neg_rank). Pool rows
    * colliding with the query itself or any of its true positives are
    * excluded BEFORE ranking, so every emitted row is a usable negative
    * (a query may emit fewer than `k` rows only if the pool nearly
    * exhausts into its positives — size the pool ≫ k).
    */
  def attachNegatives(positives: DataFrame, qidCol: String, pidCol: String,
                      pool: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val queries = positives.select(col(qidCol).as("qid")).distinct()
    val cand = queries.crossJoin(broadcast(pool))
      .filter(col("cand_id") =!= col("qid"))
      .join(positives.select(col(qidCol).as("qid"), col(pidCol).as("cand_id")),
        Seq("qid", "cand_id"), "left_anti")
    val salted = cand.withColumn("__prio", NearDup.md5Long(
      concat(col("qid").cast(StringType), lit(":"), col("cand_id").cast(StringType))))
    salted
      .withColumn("neg_rank", graft.ops.Windows.rowNumber(
        Seq(col("qid")), Seq(col("__prio"), col("cand_id"))))
      .filter(col("neg_rank") <= k)
      .select(col("qid"), col("cand_id").as("neg_id"), col("neg_rank"))
  }
}
