package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph statistics over pair lists — the near-dup pair graphs this
  * engine produces (MinHash/SimHash/embedding pairs) are graphs, and
  * their shape drives curation decisions: triangle-dense neighborhoods
  * are boilerplate families (one canonical survives), triangle-free
  * stars are template-and-variations (keep the hub, dedup spokes).
  * Complements [[DupClusters]] (connected components): components say
  * WHICH docs cluster, triangles say how DENSE the cluster is.
  */
object GraphStats {

  /** Per-node triangle participation: (id, n_triangles) for every node
    * in at least one triangle.
    *
    * Shape: edges are oriented by id (`a < b` after normalization +
    * dedup), wedges come from ONE self-equi-join on the shared middle
    * vertex, and each wedge closes against the oriented edge list — two
    * hash joins total, counting each triangle exactly once (the
    * orientation makes (x<y<z) canonical). Wedge volume is Σ deg²(v) —
    * the standard cost; on pair graphs whose degrees are bounded by the
    * near-dup bucket caps this is linear-ish in edges. For graphs with
    * power-law hubs, re-orient by (degree, id) instead of id to shrink
    * wedge counts further — same plan, different orientation key.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    trianglesOriented(materializedEdges(edges, aCol, bCol))

  /** Triangle counting over an already-oriented, deduped, MATERIALIZED
    * edge list. The oriented list is referenced three times (both wedge
    * legs + the closing join); without materialization each reference
    * re-executes the entire upstream pair chain — for near-dup graphs
    * that is the corpus-scale shingle/simhash pipeline, re-run per plan
    * branch. Callers must pass the result of [[materializedEdges]].
    */
  private def trianglesOriented(e: DataFrame): DataFrame = {
    val wedges = e.select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("y"), col("b").as("z")), "y")
    val tri = wedges.join(e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient per node:
    * `c(v) = 2·T(v) / (deg(v)·(deg(v)−1))` — 1.0 means v's neighborhood
    * is a clique (a boilerplate family), 0 means a hub of unrelated
    * near-dups (template reuse). Degree-1 and isolated nodes report
    * NULL (no wedge to close). One degree aggregation joined against
    * [[triangleCounts]]; the ratio is two exact integers through one
    * ROUNDed divide.
    */
  def clusteringCoefficients(edges: DataFrame, aCol: String,
                             bCol: String): DataFrame = {
    val e = materializedEdges(edges, aCol, bCol)
    val deg = e.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    deg.join(trianglesOriented(e), Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") < 2, lit(null).cast("double"))
          .otherwise(round((lit(2.0) * coalesce(col("n_triangles"), lit(0L)))
            / (col("degree") * (col("degree") - 1)), 6))
          .as("clustering"))
  }

  /** Orient (`a < b`), dedup, and MATERIALIZE the edge list via
    * `localCheckpoint` — the oriented edges are consumed by up to four
    * plan branches (degree, two wedge legs, triangle close), and on
    * near-dup graphs the upstream `edges` plan is a corpus-scale
    * shingle/minhash/simhash chain. Truncating the lineage here makes
    * every branch read the materialized blocks instead of re-running
    * that chain per branch (the same per-round pattern as
    * [[DupClusters.connectedComponents]]). The edge list is the SMALL
    * artifact of the pipeline (bounded by near-dup bucket caps), so
    * materializing it is cheap relative to one recompute of its chain.
    */
  private def materializedEdges(edges: DataFrame, aCol: String,
                                bCol: String): DataFrame =
    edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
}
