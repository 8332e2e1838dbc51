package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.dedup.NearDup

/** Deterministic weighted sampling — Efraimidis–Spirakis (A-ES) reservoir
  * with FIXED priorities ("Weighted random sampling with a reservoir",
  * IPL 97(5), 2006): item i gets priority uᵢ^(1/wᵢ) for uniform uᵢ; the
  * top-k priorities per key are a weight-proportional sample without
  * replacement.
  *
  * Instead of runtime randomness, uᵢ derives from the row id's md5
  * (uᵢ = (md5Long(id)+1)/2⁶⁰ ∈ (0,1], exactly representable arithmetic in
  * any engine), and ranking uses the order-equivalent log-domain priority
  * ln(uᵢ)/wᵢ — so the "random" sample is reproducible run-over-run, and the
  * SELECTION (which ids, at which ranks) replays engine-over-engine:
  * priorities are rounded to 9 dp with an id tie-break, so a last-ulp `ln`
  * difference between math libraries cannot flip the ranking. The priority
  * VALUE itself is not part of that cross-engine contract — Spark's
  * `round` (BigDecimal HALF_UP on the shortest-decimal rendering) and
  * another engine's double-domain ROUND can disagree in the final digit,
  * so consumers that need external reproducibility should compare the
  * sampled ids/ranks, not `ares_priority`.
  *
  * Scale shape: one narrow projection (md5 + ln per row) + one top-k
  * window per key — same cost as unweighted per-key sampling; the rank
  * filter plans as WindowGroupLimit, so each partition keeps k rows of
  * state, not its whole population.
  */
object Sampling {

  /** uᵢ ∈ (0,1] from the id's md5: (md5Long + 1)/2⁶⁰. The +1 excludes 0
    * (ln(0) = −∞ would tie every zero-hash row); numerator→double rounding
    * and the power-of-two divide are IEEE-identical in every engine.
    */
  private[graft] def uniformFromId(id: Column): Column =
    (NearDup.md5Long(id.cast(StringType)) + 1).cast(DoubleType) / lit(math.pow(2, 60))

  /** Log-domain A-ES priority ln(u)/w — order-equivalent to u^(1/w)
    * (larger is better), rounded for cross-engine rank stability.
    */
  def aresPriority(id: Column, weight: Column): Column =
    round(log(uniformFromId(id)) / weight, 9)

  /** Weight-proportional sample without replacement: `k` rows per key,
    * weights from `weightCol` (must be > 0 — non-positive-weight rows are
    * excluded, matching A-ES's domain). Output keeps all input columns
    * plus `ares_priority` and the per-key rank `rk` (1 = highest
    * priority).
    */
  def weightedSamplePerKey(df: DataFrame, keyCols: Seq[String],
                           idCol: String, weightCol: String, k: Int): DataFrame =
    df.filter(col(weightCol) > 0)
      .withColumn("ares_priority", aresPriority(col(idCol), col(weightCol)))
      .withColumn("rk", Windows.rowNumber(keyCols.map(col),
        Seq(col("ares_priority").desc, col(idCol))))
      .filter(col("rk") <= k)

  /** Proportional stratified sample: `ceil(frac × stratum size)` rows per
    * stratum (so no stratum rounds to empty), selected by the
    * deterministic md5-of-id order. One window partition spec serves both
    * the rank and the stratum count — one exchange, WindowGroupLimit does
    * NOT apply (the count needs the whole stratum) but the state is one
    * counter per stratum, not the population.
    *
    * Prefer dyadic `frac` values (0.125, 0.25, …) when results must
    * replay in another engine: `frac × count` is then exact IEEE
    * arithmetic; a decimal-literal frac invites engine-specific
    * decimal-vs-double promotion at the ceil boundary.
    */
  def stratifiedSample(df: DataFrame, keyCols: Seq[String],
                       idCol: String, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac=$frac must be in (0, 1]")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
    df.withColumn("rk", Windows.rowNumber(keyCols.map(col),
        Seq(md5(to_binary(col(idCol).cast(StringType), lit("utf-8"))), col(idCol))))
      .withColumn("__cnt", count(lit(1)).over(w))
      .filter(col("rk") <= ceil(lit(frac) * col("__cnt")))
      .drop("__cnt")
  }

  /** Token-budget mixing: per key (source/domain), keep documents in the
    * deterministic md5-of-id order while the running token total stays
    * within `budget` — the "N tokens per domain" mixture step of a
    * training-set build. A doc is kept iff it FULLY fits: its inclusive
    * running total must stay ≤ budget, so the first doc that overflows
    * the budget is dropped along with everything after it in the key's
    * order (never a partial document in a token-budgeted mixture): one
    * window, one exchange, integer arithmetic only.
    */
  def tokenBudgetPerKey(df: DataFrame, keyCols: Seq[String],
                        idCol: String, tokensCol: String, budget: Long): DataFrame = {
    val order = Seq(md5(to_binary(col(idCol).cast(StringType), lit("utf-8"))), col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
    df.withColumn("cum_tokens", sum(col(tokensCol).cast("long")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Temperature-based source mixing — the `n^α` reweighting of a
    * training-data pipeline: per-source budgets k_s ∝ n_s^α (α < 1 upweights
    * small sources, α = 1 is natural proportions), filled deterministically
    * by each source's md5-of-id order. Returns the selected rows with
    * `mix_budget` and the within-source rank `mix_rk`.
    *
    * Determinism across engines, by construction: n_s^α uses α = p/q
    * rational powers evaluated as `pow` on INTEGRAL n_s (both engines'
    * libm agree on integral bases in practice — the spec pins α = 0.5,
    * where IEEE `sqrt` is correctly-rounded and bit-identical by
    * standard); the share denominator Σ n_s^α is an ORDERED cumulative
    * sum (window ordered by source name, last value), so both engines add
    * the same doubles in the same order — an unordered SUM could flip a
    * last-ulp and shift a floor() budget by one. Budgets are then pure
    * integer floor arithmetic.
    *
    * Scale shape: one tiny per-source count (map-side combined), the
    * budget table is |sources| rows (broadcast join back), selection is
    * the per-key bottom-k window that plans as WindowGroupLimit.
    */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
                     alpha: Double, totalBudget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha must be in (0, 1]")
    require(totalBudget > 0, s"totalBudget=$totalBudget must be positive")
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col(sourceCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // α = 0.5 goes through sqrt, which IEEE 754 REQUIRES to be correctly
    // rounded — bit-identical in every engine, so budgets replay exactly.
    // General pow is libm-dependent (last-ulp variance → a floor() budget
    // could shift by one across engines); callers needing external
    // replay at other α should stick to sqrt-expressible powers.
    val wExpr =
      if (alpha == 0.5) sqrt(col("__n").cast(DoubleType))
      else pow(col("__n").cast(DoubleType), lit(alpha))
    val weighted = counts.withColumn("__w", wExpr)
      // ordered cumulative total: every engine sums sources in name order
      .withColumn("__wsum", sum(col("__w")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col(sourceCol))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("__wtot", max(col("__wsum")).over(wAll))
    val budgets = weighted
      .withColumn("mix_budget",
        least(floor(lit(totalBudget.toDouble) * col("__w") / col("__wtot")).cast("long"),
          col("__n")))
      .select(col(sourceCol), col("mix_budget"))
    val order = Seq(md5(to_binary(col(idCol).cast(StringType), lit("utf-8"))), col(idCol))
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(order: _*)
    df.join(budgets, Seq(sourceCol))
      .withColumn("mix_rk", row_number().over(wKey))
      .filter(col("mix_rk") <= col("mix_budget"))
  }

  /** Deterministic train/val/test assignment: the id's md5 lands in one of
    * 10⁶ integer buckets and cumulative-fraction thresholds name the
    * split. The properties a training pipeline needs, by construction:
    *
    *  - STABLE under growth — a row's split depends only on its own id,
    *    so ingesting more data never moves an old row across splits (no
    *    sampling state, no randomSplit re-draw);
    *  - disjoint and exhaustive — integer thresholds, last split takes
    *    exactly the remainder (the final threshold is pinned to 10⁶, so
    *    fraction rounding can never orphan a bucket);
    *  - zero-shuffle — one codegen'd md5 + compare chain per row, runs at
    *    scan speed on 100 TB;
    *  - engine-replayable — md5-bridge arithmetic (NOTES.md), no RNG.
    *
    * `splits` are (name, fraction) with fractions > 0 summing to 1.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)],
                  outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    splits.foreach { case (n, f) =>
      require(f > 0, s"split '$n': fraction $f must be > 0") }
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions sum to $total, expected 1.0")
    val nBuckets = 1000000L
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * nBuckets)).init // last threshold implicit: 10⁶
    // md5Long is 60-bit non-negative, so % is a true bucket index
    val bucket = NearDup.md5Long(col(idCol).cast(StringType)) % nBuckets
    val chain = splits.map(_._1).zip(cums)
      .foldRight(lit(splits.last._1): Column) { case ((name, cum), rest) =>
        when(bucket < cum, lit(name)).otherwise(rest)
      }
    df.withColumn(outCol, chain)
  }

  /** Leakage-safe split: [[assignSplit]] keyed on a GROUP column, so
    * every row of a group (domain, author, near-dup cluster canonical,
    * source shard) lands in the same split by construction. This is the
    * guard against the classic evaluation leak — near-identical rows of
    * one group straddling train and test make held-out metrics lie.
    * Same zero-shuffle / stable-under-growth / engine-replayable
    * properties as the row-level form; the fractions apply to the GROUP
    * hash space, so realized row proportions track group sizes (exact
    * row-proportion control and leakage safety are mutually exclusive —
    * a group is atomic).
    */
  def assignGroupSplit(df: DataFrame, groupCol: String,
                       splits: Seq[(String, Double)],
                       outCol: String = "split"): DataFrame =
    assignSplit(df, groupCol, splits, outCol)

  /** NEAR-DUP-safe split: [[assignGroupSplit]] keyed on the near-dup
    * CLUSTER id — the leakage guard [[assignGroupSplit]]'s scaladoc
    * names, made concrete. A document-level hash split puts two
    * near-identical documents on opposite sides of the train/test
    * boundary whenever their ids hash apart (a ~2·p·(1−p) event PER
    * near-dup pair — at corpus scale, a guarantee of leaked eval items);
    * hashing the connected-component id instead makes every near-dup
    * cluster atomic by construction. `pairs` is any (id_a, id_b)
    * similarity edge table ([[graft.dedup.NearDup.minHashLsh]],
    * SimHash, embedding near-dup — caller's choice of detector);
    * singleton docs keep their own id as cluster id, so their
    * assignment is unchanged vs the naive split.
    *
    * Scale shape: the O(log n) star-contraction CC over the edge table
    * + one hash per row — no new corpus-sized work beyond the detector
    * the pipeline already ran for dedup; pipelines REUSE those pairs.
    */
  def nearDupSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       splits: Seq[(String, Double)],
                       outCol: String = "split"): DataFrame = {
    val cc = graft.dedup.DupClusters.clusterReportStar(docs, idCol, pairs)
      .select(col("id").as("__cc_id"), col("cluster_id"))
    val withCluster = docs.join(cc, docs(idCol) === cc("__cc_id"))
      .drop("__cc_id")
    assignGroupSplit(withCluster, "cluster_id", splits, outCol)
  }

  /** Duplication-aware sampling weights — SOFT dedup: instead of
    * dropping near-duplicates, downweight every member of a duplicate
    * family so the family contributes ~unit sampling mass
    * (`weight_micro = 1e6 div cluster_size`, truncating integer
    * division — exact on any engine). Hard dedup loses the small signal
    * that a document was independently produced N times; soft dedup
    * keeps all copies visible to a weighted sampler
    * ([[weightedSample]]) while neutralizing their over-representation —
    * the downweight-by-duplicity idea behind public "soft dedup" /
    * duplication-aware sampling treatments of web corpora.
    *
    * `pairs` is any (id_a, id_b) similarity edge table (MinHash-LSH,
    * SimHash, embedding near-dup — caller's detector); singletons get
    * cluster_n = 1 and full weight. Scale shape: the O(log n)
    * star-contraction CC the pipeline already pays for dedup, one
    * cluster-size aggregation (cluster count scales with the corpus —
    * spreadable), one join back on the doc id.
    *
    * Output: (id, cluster_id, cluster_n, weight_micro).
    */
  def dupAwareWeights(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val cc = graft.dedup.DupClusters.clusterReportStar(docs, idCol, pairs)
      .select(col("id"), col("cluster_id"))
    val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("cluster_n"))
    cc.join(sizes, "cluster_id")
      .select(col("id"), col("cluster_id"), col("cluster_n"),
        expr("CAST(1000000 AS BIGINT) div cluster_n").as("weight_micro"))
  }

  /** Deterministic multi-epoch training order: epoch `e` orders the
    * corpus by `md5(e:id)` — an independent pseudo-random permutation per
    * epoch (the data-ordering step of a multi-epoch run), reproducible
    * run-over-run and engine-over-engine with zero RNG state.
    *
    * Emits (epoch, ord, id); consumers realize the order by writing with
    * `repartitionByRange(epoch, ord)` + in-partition sort. Deliberately
    * NO per-epoch `row_number` dense position: a window partitioned by
    * `epoch` has |epochs| partitions — single-digit parallelism at any
    * scale (the Normalize low-cardinality-window lesson) — and training
    * readers consume order, not positions.
    */
  def epochOrder(df: DataFrame, idCol: String, epochs: Int): DataFrame = {
    require(epochs > 0, s"epochs=$epochs must be positive")
    df.select(col(idCol).as("id"))
      .withColumn("epoch", explode(sequence(lit(1), lit(epochs), lit(1))))
      .withColumn("ord", NearDup.md5Long(
        concat(col("epoch").cast(StringType), lit(":"), col("id").cast(StringType))))
      .select("epoch", "ord", "id")
  }
}
