package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-stratum feature normalization — the "scale this column within its
  * group" step of a feature pipeline, as group statistics via partial
  * aggregation + join-back.
  *
  * Why not `Window.partitionBy(stratum)` (the rounds-≤7 shape): a window
  * partitioned by a LOW-cardinality stratum key routes every row of the
  * fact table through |strata| reducer tasks — parallelism equals the
  * number of strata, not the cluster. The 100× soak measured it: 60 M
  * rows through 3 `l_returnflag` strata took 293 s, ~300× the 1× time
  * (BASELINE.md round-8 soak). The agg+join shape scans the input twice,
  * but both passes are fully parallel: the aggregation ships only
  * map-side partials (|partitions| × |strata| tiny rows) through the
  * exchange, and the join-back attaches ≤|strata| stats rows — which AQE
  * turns into a broadcast join at runtime whenever they fit. No explicit
  * broadcast hint: at 10⁸ strata a forced broadcast would OOM the driver;
  * at 3 strata AQE broadcasts by itself. Full scan parallelism at every
  * stratum cardinality.
  *
  * Float-determinism discipline (NOTES.md playbook): the z-score derives
  * stddev from SUM/SUM(x²)/COUNT with the exact expression shape an
  * external engine can replay — `sqrt((Σx² − (Σx)²/n) / (n−1))` — rather
  * than `stddev_samp`, whose internal accumulation order is
  * implementation-defined.
  */
object Normalize {

  /** Left-join per-key `stats` back onto `df` with NULL-SAFE key equality,
    * preserving the window formulation's semantics where a NULL stratum
    * key is a group of its own (a plain equi-join would orphan NULL-key
    * rows). Stats key columns travel under reserved names and are dropped
    * after the join.
    */
  private def joinStats(df: DataFrame, stats: DataFrame,
                        keyCols: Seq[String]): DataFrame = {
    val renamed = keyCols.foldLeft(stats)((s, k) => s.withColumnRenamed(k, s"__k_$k"))
    val cond = keyCols.map(k => col(k) <=> col(s"__k_$k"))
      .reduceOption(_ && _).getOrElse(lit(true)) // no keys → global stats row
    df.join(renamed, cond, "left").drop(keyCols.map(k => s"__k_$k"): _*)
  }

  /** Sample-stddev z-score of `valueCol` within each key group:
    * `(x − μ) / σ`. Groups with fewer than 2 rows or zero variance yield
    * NULL (`try_divide`), never ±Inf/NaN or an ANSI abort.
    */
  def zscore(df: DataFrame, keyCols: Seq[String], valueCol: String,
             outCol: String): DataFrame = {
    val x = col(valueCol)
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(count(x).as("__n"), sum(x).as("__sx"), sum(x * x).as("__sx2"))
    val n = col("__n")
    val mean = col("__sx") / n
    // try_divide: n = 1 must be NULL, not an ANSI divide-by-zero abort;
    // greatest-0 clamp: catastrophic cancellation can leave the variance
    // a hair negative — clamp lands std at 0, which the outer try_divide
    // turns into NULL (greatest skips the n=1 NULL the same way)
    val varr = try_divide(col("__sx2") - col("__sx") * col("__sx") / n, n - lit(1))
    val std = sqrt(greatest(varr, lit(0.0)))
    joinStats(df, stats, keyCols)
      .withColumn(outCol, try_divide(x - mean, std))
      .drop("__n", "__sx", "__sx2")
  }

  /** Min-max scaling of `valueCol` to [0, 1] within each key group.
    * Constant groups (max = min) yield NULL, not a divide-by-zero.
    */
  def minMaxScale(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  outCol: String): DataFrame = {
    val x = col(valueCol)
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(min(x).as("__lo"), max(x).as("__hi"))
    joinStats(df, stats, keyCols)
      .withColumn(outCol, try_divide(x - col("__lo"), col("__hi") - col("__lo")))
      .drop("__lo", "__hi")
  }

  /** Winsorize `valueCol` within each key group: clip to the exact
    * [pLow, pHigh] interpolating percentiles — the outlier-taming step
    * of a feature pipeline (heavy-tailed quality scores, token counts)
    * that keeps every row but bounds its leverage, where quantileGate
    * would drop the tails entirely. Same agg+join-back shape as
    * [[zscore]] (scan-parallel at any stratum cardinality; AQE
    * broadcasts the stats rows when they fit). Spark's exact
    * `percentile` and DuckDB's `quantile_cont` share interpolation
    * semantics, so the clip bounds — and therefore every clipped
    * value — replay exactly on integral-valued inputs.
    */
  def winsorize(df: DataFrame, keyCols: Seq[String], valueCol: String,
                outCol: String, pLow: Double = 0.05,
                pHigh: Double = 0.95): DataFrame = {
    require(0.0 <= pLow && pLow < pHigh && pHigh <= 1.0,
      s"need 0 <= pLow < pHigh <= 1; got $pLow, $pHigh")
    val x = col(valueCol)
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(percentile(x, lit(pLow)).as("__lo"), percentile(x, lit(pHigh)).as("__hi"))
    joinStats(df, stats, keyCols)
      .withColumn(outCol, least(greatest(x, col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Fixed-width histogram of `valueCol` per key group: one row per
    * (key, bin) with the bin's inclusive lower bound and count — the
    * distribution-profiling query of a corpus report, pure integer
    * arithmetic (replayable anywhere), partial-aggregated.
    */
  def histogram(df: DataFrame, keyCols: Seq[String], valueCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth must be positive")
    val bin = (floor(col(valueCol) / binWidth) * binWidth).cast("long").as("bin_lo")
    df.groupBy((keyCols.map(col) :+ bin): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Per-stratum quantile gate: keep the rows of `df` whose `valueCol` is
    * at or above (default) / at or below (`keepBelow`) their stratum's
    * `q`-quantile — the "drop the bottom quartile of each language by
    * length/quality" corpus-curation step, with the cutoff ADAPTIVE per
    * stratum instead of one global constant.
    *
    * Same agg+join-back shape as [[zscore]] (and for the same reason —
    * see the class scaladoc): the per-stratum threshold is a tiny
    * aggregate attached back by a join AQE broadcasts at runtime, never a
    * `Window.partitionBy(lowCardinalityKey)` sort that would cap scan
    * parallelism at |strata|. A rank-per-row formulation (percent_rank)
    * is exactly that window — this shape gets identical row selection
    * from two fully-parallel passes.
    *
    * `percentile` is Spark's exact linear-interpolation quantile; over
    * integral-valued columns the interpolated threshold is exact IEEE
    * (quarters of integers), so the `>=` gate is deterministic and
    * externally replayable (the q_group_quantiles precedent). For
    * arbitrary float columns the threshold itself carries the usual
    * last-ulp caveat; gate on a rounded/integral signal when the result
    * must be hash-stable across engines.
    */
  def quantileGate(df: DataFrame, keyCols: Seq[String], valueCol: String,
                   q: Double, keepBelow: Boolean = false): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q=$q must be in (0, 1)")
    val x = col(valueCol)
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(percentile(x, lit(q)).as("__thr"))
    val kept = if (keepBelow) x <= col("__thr") else x >= col("__thr")
    joinStats(df, stats, keyCols)
      .filter(kept)
      .drop("__thr")
  }

  /** Exact per-group interpolating percentiles WITHOUT per-group value
    * buffering: the histogram formulation of Spark's `percentile`.
    *
    * Why: the builtin exact `percentile` aggregate buffers a
    * value→count map PER GROUP in executor memory — fine for modest
    * groups, a GC cliff / OOM for billion-row groups (the q_median_exact
    * soak characterized exactly this failure mode). Here the corpus-
    * scale work is a fully-parallel `groupBy(key, value)` partial
    * aggregate — the occurrence stream compresses to distinct
    * (key, value) pairs map-side — and everything after (cumulative
    * counts, rank lookup, interpolation) runs over the HISTOGRAM, whose
    * size is bounded by distinct values, not rows. The windows below
    * partition the histogram, not the fact table, so the
    * low-cardinality-key window trap (class scaladoc) does not apply.
    *
    * Right tool when distinct values per group ≪ rows per group —
    * integral counts, quantized scores, cents: the common corpus-signal
    * case. For continuous never-repeating doubles the histogram IS the
    * data and the buffering form is no worse; gate on a quantized signal
    * when hash-stability matters (quantileGate scaladoc).
    *
    * Interpolation replicates `Percentile.getPercentile` exactly —
    * `pos = p·(n−1)`, `(ceil(pos)−pos)·v_lo + (pos−floor(pos))·v_hi`,
    * with the same two collapse cases (integral pos; equal keys) short-
    * circuited to `v_lo` before any float multiply — so results are
    * bit-identical to [[winsorize]]'s builtin-percentile form and to
    * DuckDB's `quantile_cont`. NULL values are excluded from the
    * histogram (the aggregate's null-skip); all-NULL groups simply have
    * no histogram row and vanish from the output, matching the builtin's
    * NULL stats row under a left join-back.
    *
    * Output: one row per key group with `quantiles[i]` = the i-th
    * requested percentile, as `__q0, __q1, ...` columns.
    */
  def groupQuantilesHist(df: DataFrame, keyCols: Seq[String],
                         valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0, 1], got $ps")
    import org.apache.spark.sql.expressions.Window
    val x = col(valueCol)
    val hist = df.filter(x.isNotNull)
      .groupBy((keyCols.map(col) :+ x.as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    // both windows share one hash partitioning (and the sorted one
    // satisfies the unsorted one's requirement — single exchange)
    val wOrd = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(keyCols.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wAll))
    // per percentile: rank bounds as per-row expressions (constant
    // within a key group), v_lo/v_hi located by the cumulative count
    val aggExprs = ps.zipWithIndex.flatMap { case (p, i) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      val lo = floor(pos).cast("long")
      val hi = ceil(pos).cast("long")
      Seq(min(when(col("__cum") >= lo + 1, col("__v"))).as(s"__lo$i"),
          min(when(col("__cum") >= hi + 1, col("__v"))).as(s"__hi$i"))
    }
    val allAggs = max(col("__n")).as("__n") +: aggExprs
    val perKey = cum.groupBy(keyCols.map(col): _*)
      .agg(allAggs.head, allAggs.tail: _*)
    val out = ps.zipWithIndex.map { case (p, i) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      val loV = col(s"__lo$i").cast("double")
      val hiV = col(s"__hi$i").cast("double")
      when(lo === hi || loV === hiV, loV)
        .otherwise((hi - pos) * loV + (pos - lo) * hiV)
        .as(s"__q$i")
    }
    perKey.select(keyCols.map(col) ++ out: _*)
  }

  /** [[winsorize]] with the [[groupQuantilesHist]] percentile engine:
    * identical clipped values (the interpolation is bit-identical), but
    * the per-group state is a histogram partial aggregate instead of the
    * builtin `percentile`'s in-memory value buffer — the shape that
    * survives billion-row groups. Prefer this form for integral or
    * quantized signals; see [[groupQuantilesHist]] for the trade.
    */
  def winsorizeHist(df: DataFrame, keyCols: Seq[String], valueCol: String,
                    outCol: String, pLow: Double = 0.05,
                    pHigh: Double = 0.95): DataFrame = {
    require(0.0 <= pLow && pLow < pHigh && pHigh <= 1.0,
      s"need 0 <= pLow < pHigh <= 1; got $pLow, $pHigh")
    val x = col(valueCol)
    val stats = groupQuantilesHist(df, keyCols, valueCol, Seq(pLow, pHigh))
      .withColumnRenamed("__q0", "__lo").withColumnRenamed("__q1", "__hi")
    joinStats(df, stats, keyCols)
      .withColumn(outCol, least(greatest(x, col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Per-group median absolute deviation — the outlier-ROBUST spread
    * estimate (`mad = median(|x − median(x)|)`): unlike stddev, one
    * corrupt extreme value cannot blow up the gate, which is why robust
    * quality thresholds (flag rows beyond k·mad) survive dirty lakes
    * where z-scores drown. Composes the engine's exact-median
    * `Aggregator` twice: group medians, a broadcast-joined deviation
    * projection, then deviation medians — two aggregation passes, both
    * map-side partial via the Aggregator's `TypedImperativeAggregate`
    * buffers, no window.
    *
    * On integral or dyadic-valued inputs every median and deviation is
    * exact IEEE arithmetic; the ROUND is for arbitrary floats.
    */
  def madPerGroup(df: DataFrame, keyCols: Seq[String],
                  valueCol: String): DataFrame = {
    val med = df.groupBy(keyCols.map(col): _*)
      .agg(graft.functions.ExactMedian(col(valueCol)).as("__med"))
    joinStats(df, med, keyCols)
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("__med")), 6).as("median"),
        round(graft.functions.ExactMedian(col("__dev")), 6).as("mad"))
  }

  /** Per-group Pearson correlation of two columns, hand-rolled from the
    * five raw sums — NOT Spark's builtin `corr`, whose streaming
    * co-moment updates are partition-order dependent and cannot be
    * replayed by another engine. Here the partials are plain SUMs: on
    * integral-valued inputs (counts, cents, quantized signals) every sum
    * is exact in double below 2⁵³ in ANY merge order, the closed form
    *
    *   r = (n·Σxy − Σx·Σy) / √((n·Σxx − Σx²)(n·Σyy − Σy²))
    *
    * is the same finite float expression in both engines, and the ROUND
    * makes the residual last-ulp of the final multiply/√ invisible.
    * Degenerate groups (n < 2 or zero variance in either column) report
    * NULL via `try_divide`, never NaN or a divide abort.
    *
    * Scale: one partial-aggregated pass, |groups| output rows, no window.
    */
  def groupCorrelation(df: DataFrame, keyCols: Seq[String],
                       xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val agg = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"), sum(y * y).as("__syy"))
    val cov = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val vx = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val vy = col("__n") * col("__syy") - col("__sy") * col("__sy")
    agg.select(keyCols.map(col) :+
      col("__n").cast("long").as("n_rows") :+
      round(try_divide(cov, sqrt(vx * vy)), 6).as("pearson_r"): _*)
  }
}
