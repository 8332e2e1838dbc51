package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Semantic (embedding-space) benchmark decontamination: flag training
  * documents whose embedding lands too close (cosine ≥ τ) to ANY benchmark
  * item's embedding. Completes the decontamination matrix the token-side
  * operators span (exact n-gram / Bloom / fuzzy Jaccard / chunked
  * containment in [[graft.text.Decontaminate]]): paraphrased or translated
  * benchmark leakage carries no token n-gram overlap at all, but an
  * embedding model maps it next to the original — this is the detector
  * that catches it.
  *
  * Two tiers, mirroring the module's standard scale split:
  *
  *  - EXACT ([[flagSemanticContaminated]] / [[removeSemanticContaminated]]):
  *    the benchmark side is benchmark-sized by contract (10³–10⁵ rows —
  *    the same contract [[graft.text.Decontaminate.flagContaminated]]
  *    documents), so it broadcasts; the training corpus streams through
  *    ONCE with zero shuffle of the |train|×|bench| product — the flag
  *    form folds it map-side to one row per contaminated doc before the
  *    only exchange, and the remove form is a broadcast nested-loop ANTI
  *    join that short-circuits per training row on the first match (no
  *    aggregate, no exchange at all). Recall 1.0 by construction — the
  *    property a decontamination gate is chosen for.
  *
  *  - INDEXED ([[flagSemanticContaminatedAgainstIndex]] /
  *    [[removeSemanticContaminatedAgainstIndex]]): when the "benchmark"
  *    is itself corpus-sized (e.g. decontaminating against a whole held-out
  *    split), the exact product stops being payable; these probe the
  *    bucket-partitioned embedding index ([[Ann.writeEmbedNearDupIndex]])
  *    through the shared LSH geometry — partition-pruned reads, zero
  *    bench-side staging per batch, the documented same-bucket recall
  *    tradeoff of the [[Ann.embeddingNearDupsAgainstIndex]] detector it
  *    composes.
  *
  * Evidence contract (flag forms): one row per contaminated training doc —
  * `(id, bench_id, cosine)` where `bench_id` is the top-1 benchmark
  * neighbor, ties at equal (6-dp rounded) cosine broken by MIN bench id so
  * the report is deterministic across partitionings and engines. Cosines
  * go through the staged-norm codegen dot ([[VectorOps]]) and are rounded
  * to 6 dp, the module-wide oracle-parity discipline.
  */
object SemanticDecontam {

  /** Per-training-document contamination report: `(id, bench_id, cosine)`
    * for every train doc with top-1 benchmark cosine ≥ `tau`. Exact
    * (recall 1.0): every train×bench pair is scored, but the product is
    * folded by a PARTIAL aggregate — map-side combine reduces each task's
    * pairs to one row per local doc before the single id-keyed exchange,
    * so the shuffle is |flagged docs|, never |train|×|bench|.
    *
    * `bench` must satisfy the benchmark-size broadcast contract; for a
    * corpus-sized right side use [[flagSemanticContaminatedAgainstIndex]].
    */
  def flagSemanticContaminated(train: DataFrame, bench: DataFrame, tau: Double,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding"): DataFrame = {
    val t = train.select(col(idCol).as("id"), col(vecCol).as("tvec"))
      .withColumn("tn", VectorOps.norm(col("tvec")))
    val b = bench.select(col(idCol).as("bid"), col(vecCol).as("bvec"))
      .withColumn("bn", VectorOps.norm(col("bvec")))
    val pairs = t.crossJoin(broadcast(b))
      .select(col("id"), col("bid"),
        round(VectorOps.cosineFromParts(
          VectorOps.dot(col("tvec"), col("bvec")), col("tn"), col("bn")), 6).as("cosine"))
      .filter(col("cosine") >= tau) // shrink BEFORE the fold's partial agg
    topEvidence(pairs)
  }

  /** The filter form: `train` minus semantically contaminated docs — the
    * operator a training-set build actually calls. A broadcast
    * nested-loop LEFT ANTI join: one pass over the corpus, NO exchange,
    * and the anti semantics short-circuit each training row on its first
    * ≥ τ benchmark hit (a clean doc pays |bench| dots, a contaminated one
    * usually far fewer). Schema-preserving.
    */
  def removeSemanticContaminated(train: DataFrame, bench: DataFrame, tau: Double,
                                 idCol: String = "vec_id",
                                 vecCol: String = "embedding"): DataFrame = {
    val b = bench.select(col(vecCol).as("__bvec"))
      .withColumn("__bn", VectorOps.norm(col("__bvec")))
    // train-side norm staged once per row (a condition-side norm would be
    // recomputed per pair)
    train.withColumn("__tn", VectorOps.norm(col(vecCol)))
      .join(broadcast(b),
        round(VectorOps.cosineFromParts(
          VectorOps.dot(col(vecCol), col("__bvec")), col("__tn"), col("__bn")), 6) >= tau,
        "left_anti")
      .drop("__tn")
  }

  /** [[flagSemanticContaminated]] against the STORED embedding index
    * ([[Ann.writeEmbedNearDupIndex]] of the benchmark side) — the
    * corpus-sized-benchmark path. Composes the index detector's
    * partition-pruned bucket probe, then applies the same top-evidence
    * fold; inherits the detector's same-bucket recall contract (a pair
    * whose vectors hash to different buckets is not probed — AnnSpec
    * measures the recall; the EXACT forms above are the recall-1.0 gate).
    */
  def flagSemanticContaminatedAgainstIndex(train: DataFrame, indexPath: String,
                                           tau: Double,
                                           idCol: String = "vec_id",
                                           vecCol: String = "embedding"): DataFrame =
    topEvidence(
      Ann.embeddingNearDupsAgainstIndex(train, indexPath, tau,
          idCol = idCol, vecCol = vecCol)
        .select(col("new_id").as("id"), col("seen_id").as("bid"), col("cosine")))

  /** The filter form of the indexed path: `train` minus docs the index
    * probe flags. The flagged set can be corpus-sized, so no broadcast
    * hint — AQE sizes the anti join from runtime stats (the r15
    * static-broadcast sweep rule).
    */
  def removeSemanticContaminatedAgainstIndex(train: DataFrame, indexPath: String,
                                             tau: Double,
                                             idCol: String = "vec_id",
                                             vecCol: String = "embedding"): DataFrame =
    train.join(
      flagSemanticContaminatedAgainstIndex(train, indexPath, tau, idCol, vecCol)
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** [[flagSemanticContaminatedAgainstIndex]] against a pre-resolved
    * [[Ann.EmbedIndexHandle]] — identical flags (handle ≡ path by the
    * Ann contract), but per-call cost is pure batch work. The streaming
    * gate's form: the benchmark index is immutable for a stream's life,
    * so its meta/caps/staging belong at stream START
    * ([[Ann.openEmbedNearDupIndex]]), not in every micro-batch.
    */
  def flagSemanticContaminatedAgainstHandle(train: DataFrame,
                                            handle: Ann.EmbedIndexHandle,
                                            tau: Double,
                                            idCol: String = "vec_id",
                                            vecCol: String = "embedding"): DataFrame =
    topEvidence(
      Ann.embeddingNearDupsAgainstHandle(train, handle, tau,
          idCol = idCol, vecCol = vecCol)
        .select(col("new_id").as("id"), col("seen_id").as("bid"), col("cosine")))

  /** Filter form of the handle path — `train` minus flagged. */
  def removeSemanticContaminatedAgainstHandle(train: DataFrame,
                                              handle: Ann.EmbedIndexHandle,
                                              tau: Double,
                                              idCol: String = "vec_id",
                                              vecCol: String = "embedding"): DataFrame =
    train.join(
      flagSemanticContaminatedAgainstHandle(train, handle, tau, idCol, vecCol)
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Top-1 evidence fold over (id, bid, cosine) pairs: max cosine per id,
    * ties → MIN bench id. One partial aggregate — `min` over a
    * (−cosine, bid) struct makes both directions a single lexicographic
    * compare while leaving `bid`'s type generic (the NearDup id-type
    * rule: no numeric negation on the caller's id column).
    */
  private def topEvidence(pairs: DataFrame): DataFrame =
    pairs
      .groupBy(col("id"))
      .agg(min(struct((-col("cosine")).as("nc"), col("bid").as("b"))).as("top"))
      .select(col("id"), col("top.b").as("bench_id"), (-col("top.nc")).as("cosine"))
}
