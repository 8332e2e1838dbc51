package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document chunking and sequence packing for training-data preparation:
  * cut documents into fixed-token windows (with overlap for context
  * continuity), and lay documents out into fixed-token-budget bins (the
  * "how many training sequences does this corpus make" step).
  *
  * Both are narrow per-row / one-window operations: chunking is a per-row
  * explode (no shuffle at all — it runs at scan speed and multiplies rows
  * locally), packing is a single running-sum window per stream.
  */
object Chunker {

  /** Overlapping fixed-size token windows: chunk k covers tokens
    * [k·stride, k·stride + chunkSize); the last chunk may be shorter, and
    * every document yields at least one chunk (short docs become one
    * under-full chunk). `stride < chunkSize` gives overlapping chunks;
    * `stride == chunkSize` gives a partition of the token stream.
    *
    * Output: (id, chunk_idx, n_tokens, chunk_text).
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize=$chunkSize must be >= 1")
    require(stride >= 1 && stride <= chunkSize,
      s"stride=$stride must be in [1, chunkSize=$chunkSize]")
    // number of windows covering a sz-token doc: ceil((sz-chunkSize)/stride)+1,
    // floored at 1 (division in double is exact: both operands are small ints)
    val staged = docs.select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("tk"))
      .withColumn("nc", greatest(
        (ceil((size(col("tk")) - chunkSize) / stride.toDouble) + 1).cast(IntegerType),
        lit(1)))
    staged
      .select(col("id"), col("tk"), explode(sequence(lit(0), col("nc") - 1)).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        slice(col("tk"), col("chunk_idx") * stride + 1, lit(chunkSize)).as("ctk"))
      .select(col("id"), col("chunk_idx"), size(col("ctk")).as("n_tokens"),
        concat_ws(" ", col("ctk")).as("chunk_text"))
  }

  /** Deterministic in-order sequence packing: documents are laid out in
    * `orderCol` order within each `groupCol` stream and the token stream is
    * cut every `budget` tokens; a document's bin is the one containing its
    * START offset (first-fit-in-order — the streaming packer a training
    * loader runs, made deterministic by the explicit order).
    *
    * One window (partition by group, order by id) = one shuffle; the bin
    * arithmetic is a running sum and a division. The double division is
    * exact while per-stream cumulative tokens stay below 2⁵³ — at larger
    * streams, split the stream (a single 2⁵³-token pack stream is already
    * a design smell).
    *
    * Output: (groupCol, orderCol, n_tokens, bin).
    */
  def packBins(docs: DataFrame, orderCol: String, textCol: String,
               groupCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    docs
      .select(col(groupCol), col(orderCol),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        floor((col("cum") - col("n_tokens")).cast(DoubleType) / budget.toDouble).cast(LongType))
      .drop("cum")
  }

  /** Materialize [[packBins]]' assignment into the actual packed
    * training sequences: one row per (stream, bin) with the member
    * documents concatenated in-order behind a separator — the artifact
    * a sequence-packing data loader reads. Order inside a bin is pinned
    * by sorting the collected (orderCol, text) structs (collect_list
    * order is partition-arrival nondeterministic; `array_sort` on the
    * struct restores determinism — same rule as every ranking here).
    *
    * Scale shape: packBins' one window + one (group, bin) hash agg;
    * a bin's payload is ~budget tokens by construction, so rows stay
    * bounded regardless of corpus size.
    *
    * Output: (groupCol, bin, n_docs, n_tokens, packed_text).
    */
  def renderBins(docs: DataFrame, orderCol: String, textCol: String,
                 groupCol: String, budget: Long,
                 sep: String = " <eod> "): DataFrame = {
    val bins = packBins(docs, orderCol, textCol, groupCol, budget)
      .select(col(groupCol), col(orderCol), col("n_tokens"), col("bin"))
    bins
      .join(docs.select(col(groupCol), col(orderCol), col(textCol)),
        Seq(groupCol, orderCol))
      .groupBy(col(groupCol), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast(LongType).as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(orderCol).as("o"), col(textCol).as("t")))),
            x => x.getField("t")),
          sep).as("packed_text"))
  }

  /** Corpus-level exact substring deduplication at chunk granularity — the
    * "remove repeated passages, keep the documents" step that whole-doc
    * exact dedup misses (boilerplate headers/footers/licenses recur inside
    * otherwise-distinct documents): partition every document into
    * non-overlapping `chunkSize`-token chunks, keep each distinct chunk's
    * GLOBAL first occurrence (smallest (id, chunk_idx)), and rebuild every
    * document from its surviving chunks in position order.
    *
    * Scale shape: the keep-first rank filter plans as `WindowGroupLimit`,
    * so each map task forwards at most ONE row per chunk hash into the
    * exchange — a passage duplicated a million times (the hot-key profile
    * of web boilerplate) costs the shuffle a handful of rows, not a
    * million, and the reducer-side sort never sees the hot key's mass.
    * Reassembly is one groupBy(id) whose per-group array sort touches only
    * SURVIVING chunks. Two exchanges total.
    *
    * Output: (id, kept_chunks, text_dedup); every input id appears — a
    * document whose every chunk lost keep-first elsewhere comes back with
    * kept_chunks = 0 and an empty string (the downstream gate decides
    * whether an emptied doc survives).
    */
  def dedupChunks(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int): DataFrame = {
    val chunks = chunk(docs, idCol, textCol, chunkSize, stride = chunkSize)
    val w = Window.partitionBy("ch").orderBy("id", "chunk_idx")
    val kept = chunks
      .withColumn("ch", graft.dedup.NearDup.md5Long(col("chunk_text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val rebuilt = kept.groupBy("id").agg(
      count(lit(1)).as("kept_chunks"),
      array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
        x => x.getField("chunk_text")), " ").as("text_dedup"))
    docs.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }
}
