package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source boilerplate removal — the C4/RefinedWeb-style cleanup where
  * content repeated across most of a domain's pages (nav bars, footers,
  * cookie banners) is stripped *relative to its own source*, not globally:
  * a token that is boilerplate on one site is signal on another.
  *
  * The boilerplate set is corpus-derived (tokens present in at least
  * `fracNum/fracDen` of a source's documents), so this is a two-pass
  * shape by necessity: no per-row function can know a token's per-source
  * document frequency. Pass 1 aggregates (source, token) document
  * frequencies from an exploded token table; pass 2 anti-joins the
  * positions table against the boilerplate set and reassembles each
  * document in token order.
  *
  * Scale notes: the threshold compare is exact integer arithmetic
  * (`df · fracDen ≥ nDocs · fracNum`) — no float frac that two engines
  * could round differently. The boilerplate set is tiny (per source, at
  * most the source's vocabulary), so AQE broadcasts it into the anti
  * join; the only wide shuffle is the per-document regroup, which hashes
  * on the document id — cardinality = corpus, perfectly spreadable. The
  * reassembly HOFs (`array_sort`/`transform` over the collected list)
  * run per-row on one document's surviving tokens — bounded by document
  * length, not corpus size — which keeps them off the
  * higher-order-function O(n²) trap (NOTES.md) that applies to repeated
  * per-element array rebuilds.
  */
object Boilerplate {

  /** Strip per-source boilerplate tokens. Returns one row per input
    * document: (id, clean_text, n_kept, n_dropped) — `clean_text` is the
    * surviving tokens rejoined in original order ('' when every token
    * was boilerplate), `n_dropped` counts removed occurrences.
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       srcCol: String, fracNum: Int, fracDen: Int): DataFrame = {
    require(fracNum > 0 && fracDen > 0 && fracNum <= fracDen,
      s"threshold $fracNum/$fracDen must be a fraction in (0, 1]")
    val base = docs
      .select(col(idCol).as("id"), col(srcCol).as("src"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
    val srcDocs = docs.groupBy(col(srcCol).as("src"))
      .agg(count(lit(1)).as("n_docs"))
    val docFreq = base.select("src", "token", "id").distinct()
      .groupBy("src", "token").agg(count(lit(1)).as("df"))
    val boiler = docFreq.join(srcDocs, "src")
      .filter(col("df") * fracDen >= col("n_docs") * fracNum)
      .select("src", "token")
    val kept = base.join(boiler, Seq("src", "token"), "left_anti")
    val rebuilt = kept.groupBy("id").agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("token")))),
          x => x.getField("token")),
        " ").as("clean_text"),
      count(lit(1)).as("n_kept"))
    docs.select(col(idCol).as("id"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("__n_tokens"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
