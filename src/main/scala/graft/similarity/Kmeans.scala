package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd) refinement over an embedding corpus — the
  * step that turns [[Ivf]]'s cheap sampled centroids into trained ones
  * (better-balanced cells → tighter IVF probe recall at the same nProbe).
  *
  * Scale shape, per iteration: assignment is [[Ivf.buildIndex]] — one
  * broadcast of the k centroids + a codegen'd argmax-cosine per row, a
  * single narrow pass with NO shuffle of the vectors; recentering
  * explodes each assigned vector to (cell, dim, value) rows — narrow
  * 20-byte rows, map-side partial aggregation, one exchange of
  * |partitions|·k·d tiny partials — and the only driver materialization
  * is the k·d updated-centroid table itself (the same driver-resident
  * centroid model MLlib's KMeans keeps; the corpus never leaves the
  * executors).
  *
  * Determinism: a float mean computed with `sum(double)` depends on the
  * partition-merge order — run-to-run nondeterminism in the trained
  * model, which a reproducible data pipeline cannot accept. Recentering
  * here accumulates FIXED-POINT values: each component is scaled by
  * 2^`scaleBits` and rounded to a long once (exact, order-free integer
  * sums), and the mean divides back out at the end. At `scaleBits = 30`
  * the per-component quantization error is ≤ 2⁻³¹ — far below float32
  * input precision — and a 2⁶³ accumulator holds ~10⁹ members per cell
  * at unit scale. Same result at any parallelism, replayable by an
  * external engine.
  */
object Kmeans {

  /** One Lloyd iteration: assign every corpus vector to its nearest
    * centroid (cosine, [[Ivf.buildIndex]] semantics — ROUNDed score,
    * larger-cell tie-break), then per-(cell, dimension) fixed-point
    * means. Returns (cell, pos, n, mean) with `pos` 0-based; empty cells
    * simply yield no rows (standard Lloyd: an empty cell keeps its old
    * centroid — [[updatedCentroids]] does exactly that).
    */
  def lloydStep(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
                idCol: String = "vec_id", vecCol: String = "embedding",
                scaleBits: Int = 30): DataFrame = {
    require(scaleBits > 0 && scaleBits < 40, s"scaleBits=$scaleBits out of (0, 40)")
    val scale = (1L << scaleBits).toDouble
    Ivf.buildIndex(corpus, cents, idCol, vecCol)
      .select(col("cell"), posexplode(col("cvec")))
      .select(col("cell"), col("pos"),
        round(col("col").cast("double") * scale).cast("long").as("fx"))
      .groupBy("cell", "pos")
      .agg(count(lit(1)).as("n"), sum(col("fx")).as("sfx"))
      .select(col("cell"), col("pos"), col("n"),
        round(col("sfx") / (col("n") * scale), 6).as("mean"))
  }

  /** [[lloydStep]] folded back into a centroid model: cells that received
    * members move to their member mean, empty cells keep their previous
    * centroid. The collect is k·d rows — the centroid model, not data.
    */
  def updatedCentroids(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       scaleBits: Int = 30): Seq[(Long, Seq[Double])] = {
    val moved = lloydStep(corpus, cents, idCol, vecCol, scaleBits)
      .groupBy("cell")
      .agg(map_from_arrays(collect_list(col("pos")), collect_list(col("mean"))).as("m"))
      .collect()
      .map { r =>
        val m = r.getMap[Int, Double](1)
        r.getLong(0) -> (0 until m.size).map(m(_)).toSeq
      }
      .toMap
    cents.map { case (cell, old) => cell -> moved.getOrElse(cell, old) }
  }

  /** Driver-side Lloyd loop: `iters` rounds of assign + recenter starting
    * from [[Ivf.centroids]]' deterministic sample. Each round is two
    * distributed passes; only the k·d centroid model crosses the driver.
    */
  def train(corpus: DataFrame, k: Int, iters: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            scaleBits: Int = 30): Seq[(Long, Seq[Double])] =
    (1 to iters).foldLeft(Ivf.centroids(corpus, k, idCol, vecCol)) {
      (cents, _) => updatedCentroids(corpus, cents, idCol, vecCol, scaleBits)
    }
}
