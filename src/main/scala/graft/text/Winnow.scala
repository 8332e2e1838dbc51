package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.NearDup

/** Position-selective document fingerprinting — the published
  * winnowing family (local-minimum selection over rolling shingle
  * hashes) and content-defined chunking (hash-threshold boundaries).
  * Both answer the weakness of fixed-stride spans ([[SubstrDedup]]):
  * insert one character near the front of a copied document and every
  * stride-aligned span shifts, so nothing matches. Selecting positions
  * by a LOCAL property of the content itself (this hash is the
  * neighborhood minimum; this hash is ≡ 0 mod m) makes the selected
  * positions re-align immediately after any edit — the guarantee
  * plagiarism detection and dedup-friendly chunking are built on.
  *
  * Scale shape: both operators are one corpus scan, one generate
  * (stride-1 shingle hashes — ~1 hash per char, 16-byte rows), and one
  * id-partitioned window (cardinality = document count, so maximal
  * parallelism; frames are char-bounded so state per row is O(w)).
  * Nothing shuffles text; nothing is pairwise.
  */
object Winnow {

  private def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
                            k: Int): DataFrame =
    docs.filter(length(col(textCol)) >= k)
      .select(col(idCol).as("id"),
        explode(sequence(lit(0), length(col(textCol)) - k, lit(1)))
          .as("pos"),
        col(textCol).as("__t"))
      .select(col("id"), col("pos"),
        NearDup.md5Long(expr(s"substring(__t, pos + 1, $k)")).as("h"))

  /** Winnowed fingerprints: (id, pos, h) for every position whose
    * k-char shingle hash is the minimum within `w-1` positions on
    * either side (the symmetric local-minimum variant: deterministic,
    * self-synchronizing, expected density ~1/w; equal-hash neighbors
    * are both kept — a tie means the content itself repeats). Two
    * documents sharing any k-char run of length ≥ k+w-1 are guaranteed
    * to share a fingerprint.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 16, w: Int = 8): DataFrame = {
    require(k >= 1 && w >= 2, s"need k>=1 (got $k) and w>=2 (got $w)")
    val win = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(-(w - 1), w - 1)
    shingleHashes(docs, idCol, textCol, k)
      .withColumn("m", min(col("h")).over(win))
      .filter(col("h") === col("m"))
      .select("id", "pos", "h")
  }

  /** The 100 TB winnowing path: same selection contract as
    * [[fingerprints]] (local-minimum in a symmetric w-window, ties all
    * selected) via the single-pass O(n) codegen expression
    * [[graft.functions.WinnowPositions]] — two-lane mod-P rolling
    * polynomial hash + monotonic-deque minimum, no per-position md5,
    * no window sort, no shuffle at all (selection is per-document
    * local work at scan speed). Different hash family than the md5
    * form, so the two forms' fingerprints are not interchangeable;
    * positions are code-point based (≡ SQL substr positions, ≡ bytes
    * on ASCII). The mod-P lanes make this form DuckDB-replayable, so
    * it carries a full oracle row (q_winnow_fast) like the md5 twin.
    */
  def fingerprintsFast(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 16, w: Int = 8): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(graft.functions.WinnowPositions
          .winnowPositions(col(textCol), k, w)).as("fp"))
      .select(col("id"), col("fp.pos").as("pos"), col("fp.h").as("h"))

  /** Content-defined chunk statistics: a chunk boundary falls after
    * every position whose shingle hash is ≡ 0 (mod `modulus`), so the
    * expected chunk length is `modulus` chars and boundaries re-anchor
    * on content after any insertion/deletion. Returns one row per
    * document — (id, n_chunks, avg_chunk_chars) with the average an
    * exact integer divide — including sub-`k` documents (one chunk).
    */
  def cdcChunkStats(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 16, modulus: Int = 64): DataFrame = {
    require(modulus >= 2, s"modulus=$modulus must be >= 2")
    // ONE scan: explode_outer keeps sub-k documents as a single null
    // position (they contribute zero boundaries but must still emit a
    // one-chunk row) — the join-back alternative would re-scan the
    // corpus just to recover document lengths.
    docs
      .select(col(idCol).as("id"), length(col(textCol)).as("__len"),
        explode_outer(when(length(col(textCol)) >= k,
          sequence(lit(0), length(col(textCol)) - k, lit(1)))).as("pos"),
        col(textCol).as("__t"))
      .select(col("id"), col("__len"),
        when(col("pos").isNotNull,
          NearDup.md5Long(expr(s"substring(__t, pos + 1, $k)"))).as("h"))
      .groupBy("id")
      .agg(first(col("__len")).as("__len"),
        sum(when(col("h") % modulus === 0, 1L).otherwise(0L))
          .as("n_bounds"))
      .select(col("id"), (col("n_bounds") + 1L).as("n_chunks"),
        expr("CAST(__len AS BIGINT) DIV (n_bounds + 1L)")
          .as("avg_chunk_chars"))
  }
}
