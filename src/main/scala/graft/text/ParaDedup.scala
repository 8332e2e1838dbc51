package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.NearDup

/** Paragraph-level exact deduplication — the corpus-wide "remove
  * repeated paragraphs, keep the first occurrence" pass of the
  * RefinedWeb/MassiveText curation lineage (boilerplate notices, shared
  * footers, syndicated intro blocks repeat VERBATIM across millions of
  * pages; document-level dedup never sees them because the documents
  * differ elsewhere). Sits between document-granularity dedup
  * ([[graft.dedup.NearDup]]) and character-granularity span removal
  * ([[SubstrDedup]]): the unit here is a structural block, and the
  * repair is whole-block drop + stitched reassembly, never a
  * mid-sentence cut.
  *
  * Semantics: a paragraph INSTANCE (one block of one document) survives
  * iff it is the globally first occurrence of its exact text — ordered
  * by (id, paragraph index), so the kept set is deterministic and
  * independent of partitioning — or the block is shorter than
  * `minChars` (too short to be a meaningful duplicate; blank separator
  * blocks pass through). Every input document comes back (possibly with
  * all blocks removed), with survivors re-joined by the original
  * delimiter in original order.
  *
  * Scale shape (100 TB): one split+posexplode of the corpus; the
  * first-occurrence winner per paragraph hash is a `min(struct(id,
  * idx))` AGGREGATION — partial map-side combine on (hash) keys, no
  * global sort-window over the corpus — joined back hash-to-hash; the
  * reassembly shuffles (id, idx, para) rows once on id, the shuffle any
  * per-document output already pays. Nothing is all-pairs and no state
  * exceeds one paragraph row.
  */
object ParaDedup {

  /** Split into paragraph instances: (id, pidx, para) with `pidx`
    * 0-based document order. `delim` is a LITERAL delimiter (regex
    * metacharacters are quoted before the split), trailing empty blocks
    * included — structure is preserved exactly for reassembly.
    */
  def paragraphs(docs: DataFrame, idCol: String, textCol: String,
                 delim: String = "\n\n"): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim))))
      .withColumnRenamed("pos", "pidx")
      .withColumnRenamed("col", "para")

  /** Duplicate-paragraph profile, the detection half: one row per
    * paragraph text occurring more than once corpus-wide (and at least
    * `minChars` long): (para_hash, n_copies, n_docs, keep_id,
    * keep_pidx, para_chars) — `keep_id`/`keep_pidx` the globally first
    * instance that [[dedupParagraphs]] will retain.
    */
  def dupParagraphProfile(docs: DataFrame, idCol: String, textCol: String,
                          delim: String = "\n\n", minChars: Int = 1): DataFrame = {
    require(minChars >= 1, s"minChars=$minChars must be >= 1")
    val p = paragraphs(docs, idCol, textCol, delim)
      .filter(length(col("para")) >= minChars)
      .withColumn("h", NearDup.md5Long(col("para")))
    p.groupBy("h")
      .agg(count(lit(1)).as("n_copies"),
        count_distinct(col("id")).as("n_docs"),
        min(struct(col("id"), col("pidx"))).as("__first"),
        max(length(col("para"))).as("para_chars"))
      .filter(col("n_copies") > 1)
      .select(col("h").as("para_hash"), col("n_copies"), col("n_docs"),
        col("__first.id").as("keep_id"), col("__first.pidx").as("keep_pidx"),
        col("para_chars"))
  }

  /** The dedup verb: every document reassembled from its surviving
    * blocks. Output (id, n_paras, n_kept, removed_chars, clean_text):
    * `n_paras` total blocks, `n_kept` blocks surviving (first
    * occurrences plus sub-`minChars` blocks), `clean_text` the
    * survivors re-joined by `delim` in document order.
    */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
                      delim: String = "\n\n", minChars: Int = 1): DataFrame = {
    require(minChars >= 1, s"minChars=$minChars must be >= 1")
    val p = paragraphs(docs, idCol, textCol, delim)
    val keyed = p.filter(length(col("para")) >= minChars)
      .withColumn("h", NearDup.md5Long(col("para")))
    // global first occurrence per hash: an aggregation, not a window —
    // min over the (id, pidx) struct is partition-merge-order exact.
    val first = keyed.groupBy("h")
      .agg(min(struct(col("id"), col("pidx"))).as("__first"))
      .select(col("h"), col("__first.id").as("__kid"),
        col("__first.pidx").as("__kpidx"))
    val keptKeyed = keyed.join(first, "h")
      .filter(col("id") === col("__kid") && col("pidx") === col("__kpidx"))
      .select("id", "pidx", "para")
    val survivors = keptKeyed.unionByName(
      p.filter(length(col("para")) < minChars).select("id", "pidx", "para"))
    val reassembled = survivors.groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pidx"), col("para")))),
            r => r.getField("para")),
          delim).as("clean_text"))
    docs.select(col(idCol).as("id"), col(textCol).as("__t"))
      .join(reassembled, Seq("id"), "left")
      .select(col("id"),
        (size(split(col("__t"), java.util.regex.Pattern.quote(delim))))
          .cast("long").as("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (length(col("__t")) - length(coalesce(col("clean_text"), lit(""))))
          .cast("long").as("removed_chars"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
