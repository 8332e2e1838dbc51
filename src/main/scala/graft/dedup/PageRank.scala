package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank over pair graphs — the centrality ranking
  * over the near-dup graphs this engine produces (MinHash / SimHash /
  * embedding pairs). On a near-dup graph, high-rank nodes are the
  * canonical centers of boilerplate families: PageRank complements
  * [[DupClusters]] (WHICH docs cluster) and [[GraphStats]] (how DENSE)
  * with WHO is most central — the natural keep-candidate when a cluster
  * must be collapsed to one representative.
  *
  * Arithmetic is exact-integer end to end so any engine replays it
  * bit-for-bit (the same replayability contract as the rest of this
  * library): ranks live in micro-units (1.0 ≡ 1,000,000), each out-edge
  * contribution is an integral divide `rank DIV degree`, and the damping
  * step is `150000 + (85 · Σcontrib) DIV 100` — no floating point, no
  * row-order sensitivity (integer sums commute).
  *
  * Scale shape: ONE symmetrized adjacency build (persisted — it feeds
  * every iteration), then per iteration exactly one join
  * (ranks ⋈ adjacency on src) and one partial-aggregated groupBy(dst).
  * Rank vectors are `localCheckpoint`ed per round, so iteration k+1
  * reads materialized blocks instead of re-running the k-deep lineage —
  * the [[DupClusters.connectedComponents]] pattern. Per-iteration cost
  * is O(|E|) shuffle of (dst, contrib) longs; nothing is ever all-pairs
  * and nothing is driver-side.
  */
object PageRank {

  /** Damped PageRank restricted to nodes with ≥1 edge (isolated docs
    * have no link mass to rank). Input pairs are undirected and get
    * symmetrized + deduped here; `iters` is a FIXED count, not a
    * convergence probe — training-data curation wants a reproducible
    * ranking, and on bucket-capped near-dup graphs (bounded degree) a
    * handful of iterations separates hubs from spokes.
    *
    * Returns (id, rank_micro): rank in micro-units after `iters` rounds
    * from a uniform 1,000,000-micro start.
    */
  def rankMicro(pairs: DataFrame, aCol: String = "id_a",
                bCol: String = "id_b", iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    // Symmetrize: each undirected pair pushes mass both ways. distinct()
    // guards against duplicate input pairs; degree then counts out-edges.
    // localCheckpoint MATERIALIZES the edge list before it branches into
    // the degree aggregation and the join below — on near-dup graphs the
    // upstream `pairs` plan is a corpus-scale shingle/simhash chain, and
    // materializing here guarantees it executes exactly once instead of
    // once per plan branch (the GraphStats/DupClusters lesson; edge
    // lists are the small artifact by bucket-cap construction).
    val adj = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    // Fuse degree onto the adjacency ONCE — every iteration needs
    // rank/degree per out-edge, and joining degree per round would
    // double the per-iteration shuffles. The fused list is persisted:
    // it is the loop-invariant artifact consumed by every round.
    val deg = adj.groupBy("src").agg(count(lit(1)).as("d"))
    val adjDeg = adj.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = adjDeg.select(col("src").as("id")).distinct()
      .select(col("id"), lit(1000000L).as("rank_micro"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = adjDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          expr("rank_micro DIV d").as("contrib"))
      ranks = contrib.groupBy("id")
        .agg((lit(150000L) + expr("(85 * sum(contrib)) DIV 100"))
          .as("rank_micro"))
        .localCheckpoint()
    }
    adjDeg.unpersist()
    ranks
  }
}
