package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.NearDup
import graft.ops.Sampling
import graft.text.{Decontaminate, TextAnalysis, UrlCurate}

/** The end-to-end curation FUNNEL with per-document accountability —
  * "where did my 100 TB go?". [[Trainset.build]] outputs the survivors;
  * production curation also has to explain the attrition: every dropped
  * document is attributed to exactly ONE stage (the first that rejected
  * it), so the corpus partitions cleanly into
  * `url_dup | exact_dup | quality | contaminated | budget | kept` and
  * stage-level counts reconcile to the input total by construction.
  *
  * Stage order is the C4/CCNet-lineage order: identity dedup first
  * (canonical URL, then exact text — cheap, large-volume), content
  * gates second (quality score, benchmark decontamination — exact or
  * Bloom-prefiltered via `bloomDecontam`), the token-budget mixture
  * last (budgets are meaningful only over the clean pool).
  *
  * Scale shape (100 TB): each stage is one narrow shuffle over the
  * SHRINKING survivor set — URL and text dedup are min-id aggregations
  * joined back (never a corpus-wide sort), the quality gate is
  * scan-stage arithmetic, decontamination is the one-pass left join
  * against distinct benchmark gram hashes ([[Decontaminate]]; swap in
  * the Bloom variant when the gram table outgrows the exchange), and
  * the budget pass windows per source. Dispositions are emitted as
  * id-plus-tag rows and unioned — no stage ever re-reads the corpus.
  *
  * Every stage boundary is MATERIALIZED (localCheckpoint): each stage
  * fans out into ≥2 consumers (its drop branch, its survivor branch,
  * and the next stage's aggregation), and Spark plan branches share no
  * work — without the checkpoints the stage-1 chain re-executes once
  * per downstream leaf, compounding per stage (measured: 334 s → 27 s
  * at 100×, a 12× win; the from-lazy form was the single slowest row
  * in the suite). This is also what a production curation run does
  * anyway — each stage's output lands in the lake for audit; the
  * checkpoint is that materialization in-session.
  */
object Curation {

  val stages: Seq[(Int, String)] = Seq(
    1 -> "url_dup", 2 -> "exact_dup", 3 -> "quality",
    4 -> "contaminated", 5 -> "budget", 6 -> "kept")

  /** Per-document disposition: (id, stage_order, drop_stage) — one row
    * per input document; `drop_stage` names the first stage that
    * rejected it, or `kept` (stage_order 6) for survivors.
    */
  def disposition(docs: DataFrame, bench: DataFrame,
                  urlCol: String, idCol: String, textCol: String,
                  sourceCol: String,
                  minQuality: Double, ngramN: Int, minHits: Long,
                  budgetPerSource: Long,
                  bloomDecontam: Boolean = false): DataFrame = {
    def tag(ids: DataFrame, order: Int, stage: String): DataFrame =
      ids.select(col("id"), lit(order).as("stage_order"),
        lit(stage).as("drop_stage"))

    val base = docs.select(col(idCol).as("id"), col(urlCol).as("__url"),
      col(textCol).as("__text"), col(sourceCol).as("__src"))

    // 1. canonical-URL dedup: min id per canonical form wins; rows that
    // fail to canonicalize (NULL) all survive (no URL identity to dedup).
    // canon is consumed by its own aggregation AND the join back — one
    // corpus pass, pinned; withK1 fans out to drop + survivor branches.
    val canon = base.withColumn("__canon", UrlCurate.canonicalUrl(col("__url")))
      .localCheckpoint()
    val urlFirst = canon.filter(col("__canon").isNotNull)
      .groupBy("__canon").agg(min(col("id")).as("__kid"))
    val withK1 = canon.join(urlFirst, Seq("__canon"), "left")
      .localCheckpoint()
    val drop1 = tag(withK1.filter(col("__kid").isNotNull && col("id") =!= col("__kid")),
      1, "url_dup")
    val surv1 = withK1.filter(col("__kid").isNull || col("id") === col("__kid"))
      .drop("__canon", "__kid")

    // 2. exact text dedup, same min-id aggregation shape. NULL text has
    // no content identity — md5Long(NULL) is NULL and an inner join on
    // __h would drop such rows from BOTH branches (breaking the
    // every-doc-gets-one-row reconciliation invariant on dirty input),
    // so the join is left like stage 1 and NULL-hash rows pass through
    // to die at the quality gate below.
    val h2 = surv1.withColumn("__h", NearDup.md5Long(col("__text")))
    val txtFirst = h2.filter(col("__h").isNotNull)
      .groupBy("__h").agg(min(col("id")).as("__kid"))
    val withK2 = h2.join(txtFirst, Seq("__h"), "left").localCheckpoint()
    val drop2 = tag(withK2.filter(col("__kid").isNotNull && col("id") =!= col("__kid")),
      2, "exact_dup")
    val surv2 = withK2.filter(col("__kid").isNull || col("id") === col("__kid"))
      .drop("__h", "__kid")

    // 3. quality gate (narrow on top of the stage-2 checkpoint — the
    // score is recomputed by each branch, but off pinned rows, not off
    // a re-run of the upstream shuffles). A NULL score (NULL text)
    // coalesces below every threshold so the row is ATTRIBUTED here
    // rather than silently falling through both filter branches.
    val q3 = surv2.withColumn("__q",
      coalesce(TextAnalysis.qualityScore(col("__text")), lit(Double.MinValue)))
    val drop3 = tag(q3.filter(col("__q") < minQuality), 3, "quality")
    val surv3 = q3.filter(col("__q") >= minQuality).drop("__q")
      .localCheckpoint()

    // 4. benchmark decontamination over the remaining pool —
    // flagContaminated scans its train side twice (gram explosion +
    // id base), both now off the stage-3 checkpoint. `bloomDecontam`
    // swaps in the Bloom-prefiltered variant (row-identical output by
    // contract, spec-pinned): the right knob once the benchmark gram
    // table outgrows a broadcast/shuffled exchange — only grams
    // surviving the scan-stage Bloom probe reach the confirm join.
    val surv3t = surv3.select(col("id").as("doc_id"), col("__text").as("text"))
    val bencht = bench.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val flags = (if (bloomDecontam)
        Decontaminate.bloomFlagContaminated(surv3t, bencht,
          "doc_id", "text", n = ngramN, minHits = minHits)
      else
        Decontaminate.flagContaminated(surv3t, bencht,
          "doc_id", "text", n = ngramN, minHits = minHits))
      .select(col("id"), col("contaminated"))
    val withF = surv3.join(flags, "id").localCheckpoint()
    val drop4 = tag(withF.filter(col("contaminated")), 4, "contaminated")
    val surv4 = withF.filter(!col("contaminated")).drop("contaminated")

    // 5. per-source token budget (md5-priority order, whole docs only)
    val nt = surv4.withColumn("__nt",
      TextAnalysis.tokenCount(col("__text")).cast("long"))
      .localCheckpoint()
    val kept5 = Sampling.tokenBudgetPerKey(nt, Seq("__src"), "id", "__nt",
      budgetPerSource).select("id")
    val drop5 = tag(nt.join(kept5, Seq("id"), "left_anti"), 5, "budget")
    val kept = tag(kept5, 6, "kept")

    drop1.unionByName(drop2).unionByName(drop3).unionByName(drop4)
      .unionByName(drop5).unionByName(kept)
  }

  /** Stage-level attrition report from a [[disposition]] frame:
    * (stage_order, drop_stage, n_docs) — drop rows count casualties,
    * the final row counts the surviving corpus; rows sum to the input.
    */
  def funnel(disp: DataFrame): DataFrame =
    disp.groupBy("stage_order", "drop_stage")
      .agg(count(lit(1)).as("n_docs"))

  /** The per-document decontamination MATRIX — the release-review
    * artifact the single-detector flag tables can't give: one row per
    * training doc with EVERY detector family's verdict side by side,
    * `(id, exact, fuzzy, chunked, semantic, contaminated)`. The
    * families fail differently (exact n-grams miss edits, whole-doc
    * token Jaccard misses paraphrase AND containment, the chunked
    * window scan catches the embedded-item case, embeddings miss what
    * the encoder can't see), so a release decision reads the union
    * while an incident review reads the disagreements — e.g.
    * semantic-only rows are the paraphrase candidates worth a human
    * look, chunked-only rows the embedded-item ones.
    *
    * Inputs: the doc-side split (train/bench texts) plus the
    * EMBEDDING-side split (train/bench vectors, ids aligned with doc
    * ids); a train doc with no vector simply can't be semantically
    * flagged (NULL-safe false). Scale shape: three independent detector
    * passes (each already scale-shaped — see their own docs) folded by
    * two id-keyed left joins onto the exact report's one-row-per-doc
    * base; flag sets can be corpus-sized, so no broadcast hints — AQE
    * sizes the joins (the r15 static-broadcast sweep rule). The doc
    * inputs are MATERIALIZED once (the [[disposition]] stage-boundary
    * rule): three detectors × two branches each would otherwise re-read
    * the corpus parquet up to 7× — with the pin, one scan per side ever.
    */
  def decontamMatrix(train: DataFrame, bench: DataFrame,
                     trainVecs: DataFrame, benchVecs: DataFrame,
                     idCol: String, textCol: String,
                     vecIdCol: String = "vec_id", vecCol: String = "embedding",
                     ngramN: Int = 13, minHits: Long = 1L,
                     fuzzyThreshold: Double = 0.9,
                     chunkSize: Int = 24, chunkStride: Int = 12,
                     chunkThreshold: Double = 0.5,
                     tau: Double = 0.3): DataFrame = {
    val trainP = train.select(col(idCol), col(textCol)).localCheckpoint()
    val benchP = bench.select(col(idCol), col(textCol)).localCheckpoint()
    val exact = Decontaminate
      .flagContaminated(trainP, benchP, idCol, textCol, ngramN, minHits)
      .select(col("id"), col("contaminated").as("exact"))
    val fuzzy = Decontaminate
      .flagNearContaminated(trainP, benchP, idCol, textCol, threshold = fuzzyThreshold)
      .select(col("id"), lit(true).as("fuzzy"))
    // containment scan against the benchmark ITEMS — the matrix treats
    // each bench doc's first `chunkSize` tokens as the item (the
    // embedded-benchmark fixture convention); windows of the train docs
    // are LSH-matched item-vs-window
    val benchItems = benchP.select(col(idCol),
      concat_ws(" ", slice(graft.text.TextAnalysis.tokens(col(textCol)), 1, chunkSize))
        .as(textCol))
    val chunked = Decontaminate
      .flagNearContaminatedChunked(trainP, benchItems, idCol, textCol,
        chunkSize = chunkSize, stride = chunkStride, threshold = chunkThreshold)
      .select(col("id"), lit(true).as("chunked"))
    val semantic = graft.similarity.SemanticDecontam
      .flagSemanticContaminated(trainVecs, benchVecs, tau, vecIdCol, vecCol)
      .select(col("id"), lit(true).as("semantic"))
    exact
      .join(fuzzy, Seq("id"), "left")
      .join(chunked, Seq("id"), "left")
      .join(semantic, Seq("id"), "left")
      .select(col("id"), col("exact"),
        coalesce(col("fuzzy"), lit(false)).as("fuzzy"),
        coalesce(col("chunked"), lit(false)).as("chunked"),
        coalesce(col("semantic"), lit(false)).as("semantic"))
      .withColumn("contaminated",
        col("exact") || col("fuzzy") || col("chunked") || col("semantic"))
  }
}
