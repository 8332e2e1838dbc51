package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Threshold set-similarity self-join via prefix filtering (the PPJoin
  * family: Chaudhuri et al. ICDE 2006, Xiao et al. WWW 2008 — public
  * algorithms).
  *
  * The all-pairs Jaccard join is the textbook scale cliff: an
  * inverted-index join on ANY shared token makes every stopword a
  * corpus²-sized candidate bucket. Prefix filtering bounds it with two
  * exact (no-false-negative) pruning rules derived from the threshold t:
  *
  *  - '''Prefix filter''': order every document's distinct tokens by one
  *    global total order (ascending document frequency, i.e. rarest
  *    first, ties by token). If J(a,b) >= t, then a and b MUST share a
  *    token inside their first `|s| - ceil(t*|s|) + 1` tokens — so only
  *    prefix tokens are indexed/joined, and prefixes are by construction
  *    the RARE tokens, keeping every join bucket small.
  *  - '''Length filter''': J(a,b) >= t implies t*|a| <= |b| (and
  *    symmetrically), applied as integer arithmetic inside the join.
  *
  * Candidates that survive both filters are verified with the exact
  * Jaccard on the full token arrays, so the output is identical to the
  * brute-force join — the filters only remove work, never results. The
  * oracle replays the BRUTE-FORCE inverted-index formulation, so a
  * prefix off-by-one would surface as a missing pair (hash mismatch),
  * not as silently-passing "agreement".
  *
  * Scale shape: one explode + one (token) hash agg for document
  * frequencies, one per-doc window for prefix ranks (partition key
  * cardinality = #docs, scales with data), one equi-join on rare prefix
  * tokens, then a verification join that touches only surviving pairs.
  * No cartesian anywhere; every shuffle key is either the token or the
  * doc id. Threshold t is carried as the exact rational tNum/tDen so all
  * pruning arithmetic stays in BIGINT (engine-agnostic, no float
  * boundary disagreements).
  *
  * Reference scope: the reference ETL dedups verbatim rows only
  * (aula-* jobs, see SURVEY.md §2 D1/D2); this is part of the
  * LLM-corpus tier layered on top of that surface.
  */
object SetSimJoin {

  /** All pairs (id_a < id_b) with exact Jaccard(tokens) >= tNum/tDen.
    *
    * Output: (id_a, id_b, inter, len_a, len_b, jaccard) — jaccard left
    * unrounded; callers that hash-compare should round.
    */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
                  tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    // The tokenized table feeds FOUR consumers (document frequencies,
    // prefix ranking, both verification sides). Without materialization
    // each branch re-scans + re-tokenizes the corpus — 6 parquet scans
    // and 4 explodes in the physical plan. localCheckpoint pins it to
    // one corpus pass (same pattern as the dedup graph operators).
    // Token-less documents are excluded up front. The whitespace split
    // yields [""] for empty/whitespace-only text, so the empty string is
    // dropped from the token set first and zero-token docs are then
    // filtered: their Jaccard is 0/0 — undefined — and the acceptance
    // predicate `tDen*inter >= tNum*union` would evaluate 0 >= 0 as true,
    // silently diverging from the brute-force definition on
    // whitespace-only fixtures. Out of contract, explicitly.
    val toks = df.select(col(idCol).cast("long").as("id"),
        array_remove(array_distinct(graft.text.TextAnalysis.tokens(col(textCol))), "").as("toks"))
      .withColumn("len", size(col("toks")).cast("long"))
      .filter(col("len") > 0)
      .localCheckpoint()

    // Global token order: ascending document frequency, ties by token —
    // one deterministic total order shared by every document.
    val docFreq = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))

    // Per-doc prefix: rank this doc's tokens by the global order, keep
    // the first len - ceil(t*len) + 1. ceil(t*len) in exact integers:
    // floorDiv(tNum*len + tDen - 1, tDen).
    val ranked = toks.select(col("id"), col("len"), explode(col("toks")).as("tok"))
      .join(docFreq, "tok")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("tok"))))
    val prefixLen = col("len") - floor((lit(tNum) * col("len") + lit(tDen - 1)) / lit(tDen)) + lit(1)
    // Both sides of the candidate self-join consume the prefix table;
    // without materialization the ranking Window (a corpus-sized sort)
    // runs twice. The table itself is tiny — ~(1-t)·|tokens| rows.
    val prefixes = ranked.filter(col("__rn") <= prefixLen)
      .select(col("tok"), col("id"), col("len"))
      .localCheckpoint()

    // Candidate pairs: share a prefix token, pass the length filter.
    val a = prefixes.select(col("tok").as("tok_a"), col("id").as("id_a"), col("len").as("len_a"))
    val b = prefixes.select(col("tok").as("tok_b"), col("id").as("id_b"), col("len").as("len_b"))
    val candidates = a.join(b,
        col("tok_a") === col("tok_b") &&
        col("id_a") < col("id_b") &&
        lit(tNum) * col("len_a") <= lit(tDen) * col("len_b") &&
        lit(tNum) * col("len_b") <= lit(tDen) * col("len_a"))
      .select("id_a", "id_b").distinct()

    // Exact verification on full token arrays — only surviving pairs.
    val ta = toks.select(col("id").as("id_a"), col("toks").as("__ta"))
    val tb = toks.select(col("id").as("id_b"), col("toks").as("__tb"))
    val inter = size(array_intersect(col("__ta"), col("__tb"))).cast("long")
    candidates.join(ta, "id_a").join(tb, "id_b")
      .withColumn("inter", inter)
      .withColumn("len_a", size(col("__ta")).cast("long"))
      .withColumn("len_b", size(col("__tb")).cast("long"))
      // J >= tNum/tDen  ⇔  tDen*inter >= tNum*union — pure BIGINT.
      .filter(lit(tDen) * col("inter") >=
        lit(tNum) * (col("len_a") + col("len_b") - col("inter")))
      .select(col("id_a"), col("id_b"), col("inter"), col("len_a"), col("len_b"),
        (col("inter").cast("double") /
          (col("len_a") + col("len_b") - col("inter")).cast("double")).as("jaccard"))
  }
}
