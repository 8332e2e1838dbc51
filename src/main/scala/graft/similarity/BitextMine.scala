package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining — the parallel-corpus miner of a
  * multilingual training-data pipeline (the CCMatrix/LASER recipe,
  * Artetxe & Schwenk 2019, public method): a candidate pair (x, y) is
  * scored not by raw cosine but by the RATIO margin
  *
  *   margin(x, y) = cos(x, y) / ((avgTopK(x→B) + avgTopK(y→A)) / 2)
  *
  * which normalizes away "hub" vectors that are close to everything —
  * raw-cosine thresholds either flood with hub pairs or drop everything
  * else; the margin is the standard fix.
  *
  * Compositional contract (the [[Fusion]] design): inputs are two
  * already-computed top-k retrieval tables — `fwd` (queries = side A
  * against corpus B) and `bwd` (B against A) in the (qid, cid, cosine,
  * rank) shape every retriever in this library emits
  * ([[Ann.bruteForceTopK]], [[Ann.lshShuffledTopK]], [[Ivf.topK]]) — so
  * the same miner runs on brute-force scores at eval scale and on
  * LSH/IVF candidates at 100 TB. The miner itself adds only
  * |A|·k-sized aggregations and joins: nothing here touches corpus
  * payloads.
  *
  * Determinism: per-query top-k sums accumulate the ROUNDed micro-unit
  * cosines as integers (exact in any order); each margin is then one
  * double multiply chain + one division over integer-backed values,
  * rounded to 6 — externally replayable like every ranking here.
  */
object BitextMine {

  /** Mine pairs from `fwd`/`bwd` top-k tables (columns qid, cid,
    * cosine, rank).
    *
    * Output: (id_a, id_b, cosine, margin_micro, margin) — the fwd pairs
    * (rank ≤ k) that (a) are MUTUAL (y's own top-k contains x) when
    * `mutual`, (b) have a positive margin denominator (negative-cosine
    * neighborhoods make the ratio meaningless), and (c) clear
    * `minMarginMicro` (margin × 10⁶, integer threshold — engine-exact).
    * `bestPerQuery` keeps only each id_a's highest-margin pair (ties by
    * id_b), the usual final dedup before alignment.
    */
  def marginPairs(fwd: DataFrame, bwd: DataFrame, k: Int,
                  minMarginMicro: Long, mutual: Boolean = true,
                  bestPerQuery: Boolean = true): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val f = fwd.filter(col("rank") <= k)
      .select(col("qid").as("id_a"), col("cid").as("id_b"), col("cosine"))
    val b = bwd.filter(col("rank") <= k)
      .select(col("qid").as("id_b"), col("cid").as("id_a"), col("cosine"))
    // per-side top-k neighborhood sums, micro-unit integers (exact)
    val micro = (c: org.apache.spark.sql.Column) =>
      round(c * lit(1e6)).cast("long")
    val ax = f.groupBy("id_a")
      .agg(sum(micro(col("cosine"))).as("sa_micro"), count(lit(1)).as("na"))
    val by = b.groupBy("id_b")
      .agg(sum(micro(col("cosine"))).as("sb_micro"), count(lit(1)).as("nb"))
    val base = if (mutual) f.join(b.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_semi") else f
    // margin = 2·cos / (sa/(1e6·na) + sb/(1e6·nb))
    //        = 2·cos·1e6·na·nb / (sa·nb + sb·na) — one exact integer
    // denominator, one double chain, one ROUND.
    val den = col("sa_micro") * col("nb") + col("sb_micro") * col("na")
    val margin = round(
      lit(2.0) * col("cosine") * lit(1e6) * col("na") * col("nb") / den, 6)
    val scored = base
      .join(ax, "id_a")
      .join(by, "id_b")
      .filter(den > 0)
      .withColumn("margin", margin)
      .withColumn("margin_micro", round(col("margin") * lit(1e6)).cast("long"))
      .filter(col("margin_micro") >= minMarginMicro)
      .select(col("id_a"), col("id_b"), col("cosine"), col("margin_micro"), col("margin"))
    if (!bestPerQuery) scored
    else scored
      .withColumn("__rn", row_number().over(
        Window.partitionBy("id_a").orderBy(col("margin_micro").desc, col("id_b"))))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
