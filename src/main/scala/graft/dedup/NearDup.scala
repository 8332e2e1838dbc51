package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.TextAnalysis

/** Near-duplicate detection for document corpora: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash. All built from native Spark expressions (no
  * UDFs) so signature computation stays in WholeStageCodegen and the only
  * shuffles are the candidate-generation joins.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - signatures are a narrow per-row map over the scan;
  *  - LSH/banding turns the O(n²) all-pairs problem into a self-join on
  *    band hashes — each document lands in `bands` buckets, so the join
  *    input is `bands × n` rows, and only same-bucket pairs are compared;
  *  - the final exact verification (Jaccard / Hamming) runs only on
  *    candidate pairs, which for realistic thresholds is ≪ n².
  * Skewed buckets (boilerplate-heavy corpora) are the known hazard: AQE
  * skew-join handles moderate skew; pathological buckets should be capped
  * upstream (drop buckets with > maxBucket docs — they're boilerplate by
  * definition).
  */
object NearDup {

  // -------------------------------------------------------------------
  // Exact dedup
  // -------------------------------------------------------------------

  /** Exact duplicate groups keyed by normalized content hash; keeps the
    * minimum id as the group representative. Group-by is on the 128-bit
    * digest, not the text, so shuffle rows carry 32 bytes instead of
    * whole documents.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(TextAnalysis.docFingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  // -------------------------------------------------------------------
  // Exact Jaccard on token sets (the verifier for candidate pairs, and a
  // standalone operator for small/linear pair sets)
  // -------------------------------------------------------------------

  /** Jaccard similarity of two token-set columns (inputs must be distinct
    * arrays): |A∩B| / |A∪B| — one intersect + one union pass.
    */
  def jaccard(tokensA: Column, tokensB: Column): Column =
    size(array_intersect(tokensA, tokensB)).cast(DoubleType) /
      size(array_union(tokensA, tokensB)).cast(DoubleType)

  // -------------------------------------------------------------------
  // MinHash + LSH
  // -------------------------------------------------------------------

  /** MinHash signature over a *staged* shingle array column: `numHashes`
    * independent hash functions realized as xxhash64 with per-function
    * salt; signature[i] = min over shingles. O(shingles × numHashes) per
    * row — `sh` must be an attribute column (see
    * [[TextAnalysis.shinglesFromTokens]]) or the shingle construction is
    * re-run once per hash function in interpreted mode.
    */
  def minHashSignature(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }: _*)

  /** Stage (id, toks, shingles, signature) through separate projections so
    * each intermediate is computed once per row.
    */
  private def signatures(docs: DataFrame, idCol: String, textCol: String,
                         numHashes: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), col(textCol).as("t"),
        TextAnalysis.tokens(col(textCol)).as("tk"))
      .select(col("id"), TextAnalysis.shinglesFromTokens(col("t"), col("tk")).as("sh"))
      .select(col("id"), minHashSignature(col("sh"), numHashes).as("sig"))

  /** Candidate near-dup pairs via LSH banding of MinHash signatures.
    * `numHashes = bands × rowsPerBand`; two docs become a candidate pair
    * iff at least one band of their signatures matches exactly. Returns
    * distinct (id_a < id_b) candidate pairs with their exact token-set
    * Jaccard attached, filtered to `threshold`.
    */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
                 bands: Int = 4, rowsPerBand: Int = 4,
                 threshold: Double = 0.7,
                 maxBucket: Int = 1000): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = signatures(docs, idCol, textCol, numHashes)

    // band hash = xxhash64 over (band index, the band's signature slice).
    // The band join carries ONLY (id, bandhash): a candidate pair costs 16
    // bytes on the wire, never the document/token payload.
    val banded = sig.select(col("id"), explode(
      array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(lit(b) +: (0 until rowsPerBand)
            .map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("bh"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))

    // cap pathological buckets (boilerplate): they explode the join and
    // carry no dedup signal beyond "everything matches everything".
    val bucketSizes = banded.groupBy("band", "bh").count()
    val capped = banded.join(
      bucketSizes.filter(col("count") <= maxBucket).select("band", "bh"),
      Seq("band", "bh"))

    // distinct candidate id-pairs (a pair hitting k bands collapses to one)
    val candidates = capped.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(capped.select(col("band"), col("bh"), col("id").as("id_b")), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()

    // cheap prefilter: estimated Jaccard = fraction of agreeing signature
    // slots (the MinHash estimator). Only pairs whose estimate clears a
    // slackened threshold pay for the exact token-set verification.
    val slack = math.max(0.0, threshold - 1.5 / math.sqrt(numHashes.toDouble))
    val sigEst = candidates
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est",
        size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _), x => x)) /
          lit(numHashes.toDouble))
      .filter(col("est") >= slack)
      .select("id_a", "id_b")

    // exact verification on the surviving pairs only
    val toks = docs.select(col(idCol).as("id"),
      array_distinct(TextAnalysis.tokens(col(textCol))).as("toks"))
    sigEst
      .join(toks.select(col("id").as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("toks").as("toks_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("toks_a"), col("toks_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens, as a single aggregation:
    * explode tokens → per-bit ±1 contributions from each token's xxhash64
    * → sum per (doc, bit) → sign → reassemble. Two groupings but both on
    * the doc id, so one shuffle; the 64 bit-sums are one wide agg row.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0L, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val hashExpr = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("id"), hashExpr.as("simhash"))
  }

  /** Near-dup pairs among SimHashes with Hamming distance ≤ `maxHamming`.
    * Pigeonhole blocking: split 64 bits into `maxHamming + 1` blocks — any
    * pair within the radius agrees exactly on ≥ 1 block, so the self-join
    * runs on block equality, never all-pairs.
    */
  def simHashNearDups(sims: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nBlocks = maxHamming + 1
    val width = 64 / nBlocks
    val blocked = sims.select(col("id"), col("simhash"), explode(
      array((0 until nBlocks).map { b =>
        struct(lit(b).as("blk"),
          shiftrightunsigned(col("simhash"), b * width)
            .bitwiseAND((1L << width) - 1).as("bv"))
      }: _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.blk"), col("bb.bv"))
    val l = blocked.select(col("blk"), col("bv"), col("id").as("id_a"), col("simhash").as("sh_a"))
    val r = blocked.select(col("blk"), col("bv"), col("id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("blk", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
