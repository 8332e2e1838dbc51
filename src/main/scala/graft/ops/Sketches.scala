package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.dedup.NearDup

/** Approximate sketches for corpus monitoring at scale — the answers a
  * 100 TB pipeline needs hourly ("how many distinct documents / tokens?",
  * "what does the length distribution look like?") where the exact form
  * is an unaffordable full shuffle of the key space.
  *
  * These are deliberately thin wrappers over Spark's codegen'd sketch
  * aggregates (HyperLogLog++ and the Greenwald–Khanna-style quantile
  * summary behind `percentile_approx`): both are one-pass,
  * partial-aggregable (map-side sketches merge associatively, so the
  * shuffle carries fixed-size sketch buffers, never the key space), and
  * mergeable across partitions — the properties that make them the right
  * tool where `COUNT(DISTINCT x)` would shuffle every distinct value.
  *
  * Not DuckDB-hash-checkable by construction (sketch estimates are
  * implementation-defined); SketchesSpec pins the error contract instead:
  * estimates land within the configured bound of the exact answer on the
  * test corpus.
  */
object Sketches {

  /** Per-key approximate distinct count (HyperLogLog++) with the exact
    * row count alongside — `rsd` is the target relative standard
    * deviation (default 5%). At 100 TB this is the dedup-monitoring
    * query: distinct fingerprints per source without shuffling the
    * fingerprint space.
    */
  def approxDistinctPerKey(df: DataFrame, keyCols: Seq[String],
                           valueCol: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Per-key approximate quantiles of a numeric column. `accuracy` is the
    * percentile_approx knob (higher = tighter, more memory; guarantees
    * rank error ≤ n/accuracy). Output: one row per key with an array
    * column `qs` aligned to `probs`.
    */
  def approxQuantilesPerKey(df: DataFrame, keyCols: Seq[String],
                            valueCol: String, probs: Seq[Double],
                            accuracy: Int = 10000): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(percentile_approx(
        col(valueCol),
        array(probs.map(lit): _*),
        lit(accuracy)).as("qs"))

  /** Deterministic Count-Min sketch (Cormode & Muthukrishnan 2005) built
    * from a pre-aggregated count table — `counts` has one row per
    * distinct key with its exact multiplicity (the natural output of the
    * token-frequency groupBy a corpus pipeline already runs). Each of the
    * `depth` hash rows maps the key to `bucket = md5(r|key) mod width`
    * and sums the multiplicities landing there, so the sketch equals the
    * per-occurrence construction without a second pass over occurrences.
    *
    * Output: `(r, bucket, cnt)`, at most depth·width rows — the
    * fixed-size state that makes CMS the 100 TB frequency monitor: the
    * build is one B-bounded partial aggregate (the shuffle carries at
    * most depth·width rows PER MAP TASK, never the key space), and the
    * result broadcasts anywhere. Unlike the HLL/quantile wrappers above,
    * the md5 hash family makes this sketch bit-replayable in DuckDB, so
    * its estimates ARE oracle-hashable.
    */
  def countMinSketch(counts: DataFrame, keyCol: String, cntCol: String,
                     depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth,width >= 1; got $depth,$width")
    counts
      .select(col(keyCol).cast(StringType).as("k"),
              col(cntCol).cast(LongType).as("c"))
      .withColumn("r", explode(array((0 until depth).map(lit): _*)))
      .withColumn("bucket", cmsBucket(col("r"), col("k"), width))
      .groupBy("r", "bucket")
      .agg(sum(col("c")).as("cnt"))
  }

  /** Point-estimate lookup against a [[countMinSketch]] result: for each
    * key in `keys(keyCol)`, `cms_est = min over hash rows of the row's
    * counter` (0 for a never-touched bucket). The sketch side is
    * broadcast (≤ depth·width rows by construction), so estimating any
    * number of keys is a map-side join + partial min — no shuffle of the
    * sketch, one keyed shuffle of the candidates.
    *
    * CMS guarantees `exact ≤ est` always, and
    * `est ≤ exact + ε·N` with probability 1−δ for width = ⌈e/ε⌉,
    * depth = ⌈ln(1/δ)⌉ — SketchesSpec pins the one-sided bound exactly.
    */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                       depth: Int, width: Int): DataFrame =
    keys
      .select(col(keyCol).cast(StringType).as("k"))
      .withColumn("r", explode(array((0 until depth).map(lit): _*)))
      .withColumn("bucket", cmsBucket(col("r"), col("k"), width))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy("k")
      .agg(min(col("cnt")).as("cms_est"))
      .withColumnRenamed("k", keyCol)

  /** Hash-row bucket: md5Long("r|key") mod width — md5Long is 60-bit
    * non-negative so plain mod is already the positive residue, and the
    * same expression replays verbatim in the DuckDB oracle.
    */
  private def cmsBucket(r: org.apache.spark.sql.Column,
                        k: org.apache.spark.sql.Column, width: Int) =
    NearDup.md5Long(concat_ws("|", r.cast(StringType), k)) % lit(width.toLong)
}
