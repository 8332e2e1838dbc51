package graft

/** Plan-quality regression net: the properties that make these queries
  * scale are asserted on the optimized physical plan, so a refactor that
  * silently loses pushdown, adds an exchange, or drops a broadcast fails
  * CI — not a 100 TB run.
  */
class PlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q_s1: filter pushed into the parquet scan, columns pruned") {
    val p = plan("q_s1_scan_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double>"), "scan must read 4 of 11 columns")
  }

  test("q_join: dimension sides broadcast, aggregation is partial+final") {
    val p = plan("q_join_revenue_by_segment")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "small-SF joins must not sort-merge")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side partial aggregation expected")
  }

  test("q_w5: all six rolling aggregates share one Window over one exchange") {
    val p = plan("q_w5_rolling_stats")
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    // shuffle exchanges: one for the window partitioning, one for the
    // final global sort
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size +
      "Exchange rangepartitioning".r.findAllIn(p).size
    assert(windows === 1, s"expected a single Window operator:\n$p")
    assert(exchanges <= 2, s"expected ≤2 exchanges (window + output sort):\n$p")
  }

  test("q_pipeline: dedup rank is WindowGroupLimit-pruned; code-partitioned windows share an exchange") {
    val p = plan("q_pipeline_refined")
    assert(p.contains("WindowGroupLimit"), "rank filter must push a group limit")
    // one hash exchange on code (shared by the dedup window AND all the
    // per-code analytic windows — subset-clustering rule) + the output
    // range sort; anything more means the sharing regressed
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    val rangeEx = "Exchange rangepartitioning".r.findAllIn(p).size
    assert(hashEx === 1, s"expected exactly 1 hash exchange:\n$p")
    assert(rangeEx <= 1, s"expected ≤1 range exchange:\n$p")
  }

  test("q_asof: one hash exchange joins both sides (the tagged-union design claim)") {
    // AsOfJoin's whole point is that L and R meet in ONE shuffle on the
    // key (tagged union + window carry) — a second hash exchange would
    // mean the union stopped sharing the partitioning.
    val p = plan("q_asof_join")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx === 1, s"as-of join must cost exactly 1 hash exchange:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "as-of is composed via union+window, not a join operator")
  }

  test("q_sessionize: lag boundary + running session-id share one exchange") {
    val p = plan("q_sessionize")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx === 1, s"sessionize windows must share 1 hash exchange:\n$p")
  }

  test("q_agg: partial aggregation before the shuffle") {
    val p = plan("q_agg_groupby")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // plan strings truncate long schemas — match the pruned column list
    assert(p.contains("FileScan parquet [l_quantity#"), "scan must start at l_quantity (pruned)")
    assert(!p.contains("l_orderkey"), "key columns must be pruned from the agg scan")
  }

  test("q_topk: sort+limit plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("chunk: the window explode is shuffle-free (runs at scan speed)") {
    // Chunker.chunk is a per-row multiply — ANY exchange means a shuffle
    // crept into what must stay a narrow map at 100 TB.
    val p = graft.text.Chunker.chunk(
      graft.ops.Tables.read(spark, dir, "documents"), "doc_id", "text", 32, 24)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  test("q_pack_bins: one hash exchange for the running-sum window") {
    val p = plan("q_pack_bins")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx === 1, s"packing must cost exactly 1 hash exchange:\n$p")
  }

  test("q_vocabulary: top-k vocabulary plans as TakeOrderedAndProject, never a global sort") {
    val p = plan("q_vocabulary")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"),
      s"a web-scale vocabulary must not be globally sorted:\n$p")
  }

  test("q_repetition: gram counting is partial-aggregated, no cartesian") {
    val p = plan("q_repetition")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side partial aggregation expected")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_pii_scrub: redaction is a pure per-row map — no hash exchange") {
    val p = plan("q_pii_scrub")
    assert(!p.contains("Exchange hashpartitioning"),
      s"regexp scrubbing must run at scan speed:\n$p")
  }

  test("q_range_join_keyed: user key rides the grid equi-join, no nested loop") {
    val p = plan("q_range_join_keyed")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"keyed range join must stay an equi-join:\n$p")
    // the key must be part of the join condition (bounding candidates per
    // (key, bucket)), not a post-join residual filter
    assert(p.contains("user_id#") && "user_id#\\d+L?, __bucket".r.findFirstIn(p).isDefined,
      s"user_id must be a join key alongside the grid bucket:\n$p")
  }

  test("q_median_exact: holistic Aggregator still partial-aggregates map-side") {
    val p = plan("q_median_exact")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"partial+final ObjectHashAggregate expected (buffers shuffle, rows don't):\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_median_window: one Window operator, bounded exchanges") {
    val p = plan("q_median_window")
    assert("\\bWindow\\b".r.findAllIn(p).size === 1, s"a single Window expected:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size +
      "Exchange rangepartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"window exchange + output sort only:\n$p")
  }

  test("bloom decontaminate: membership prefilter runs scan-side, before any exchange") {
    val d = graft.ops.Tables.read(spark, dir, "documents")
    val df = graft.text.Decontaminate.bloomFlagContaminated(
      d.filter(org.apache.spark.sql.functions.col("doc_id") < 80),
      d.filter(org.apache.spark.sql.functions.col("doc_id") >= 80),
      "doc_id", "text", n = 3, minHits = 1)
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("bloommightcontainlong"),
      s"the codegen'd bloom test must be in the plan:\n$p")
    // node-order assert: the bloom Filter must sit on the SCAN side of its
    // branch — its subtree (deeper-indented following lines) must reach a
    // scan without crossing an Exchange. If an exchange ever slipped below
    // the filter, every training gram would shuffle before being tested
    // and the prefilter's whole point (shrink the exchange) is lost.
    val lines = p.linesIterator.toVector
    def indent(l: String) = l.indexWhere(c => !" :+-".contains(c))
    val fIdx = lines.indexWhere(l =>
      l.contains("Filter") && l.toLowerCase.contains("bloommightcontainlong"))
    assert(fIdx >= 0, s"expected a Filter node carrying the bloom test:\n$p")
    val subtree = lines.drop(fIdx + 1).takeWhile(l => indent(l) > indent(lines(fIdx)))
    assert(subtree.exists(_.contains("Scan")),
      s"bloom filter must sit directly above its scan:\n$p")
    assert(!subtree.exists(_.contains("Exchange")),
      s"no exchange may run below the bloom prefilter:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_quantile_gate: threshold attaches as broadcast join, no stratum window") {
    val p = plan("q_quantile_gate")
    assert(!p.contains("Window"),
      s"a lang-partitioned window would cap parallelism at |langs|:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"per-stratum cutoffs must broadcast back:\n$p")
  }

  test("q_tfidf: single per-doc window, partial-aggregated counts, no cartesian") {
    val p = plan("q_tfidf_topterms")
    assert("\\bWindow\\b".r.findAllIn(p).size === 1, s"one top-k window expected:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side partial aggregation expected")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_pmi: top-k is TakeOrderedAndProject; joins are hash, never nested-loop over data") {
    val p = plan("q_pmi_bigrams")
    assert(p.contains("TakeOrderedAndProject"),
      s"count-ranked top-k must not globally sort the pair table:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_kmeans_step: assignment is join-free (literal centroids); one hash exchange") {
    val p = plan("q_kmeans_step")
    // centroids are plan literals — the corpus pass must be a narrow map,
    // and the only shuffle the (cell, pos) partial aggregation
    assert(!p.contains("Join"), s"assignment must not join, centroids are literals:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx === 1, s"recentering must cost exactly 1 hash exchange:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side partial aggregation expected")
  }

  test("q_rolling_active: day-granular explode, hash aggs, no range self-join") {
    val p = plan("q_rolling_active")
    assert(p.contains("Generate explode"), s"window fan-out must be the explode:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the day×window range join formulation must not appear:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "both distinct passes must partial-aggregate")
  }

  test("q_chunk_dedup: WindowGroupLimit bounds the keep-first shuffle; two hash exchanges") {
    val p = plan("q_chunk_dedup")
    assert(p.contains("WindowGroupLimit"),
      s"hot boilerplate chunks must be map-side-limited before the exchange:\n$p")
    // keep-first window on hash + reassembly groupBy(id); the outer
    // left-join attaches as broadcast at this SF
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 3, s"chunk dedup must stay at the designed exchange budget:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_ann_ivf_trained: literal trained centroids, no cartesian, broadcast probe join") {
    val p = plan("q_ann_ivf_trained")
    assert(!p.contains("CartesianProduct"),
      s"probe must join on cell, never cross:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the tiny query side must broadcast:\n$p")
  }

  test("q_bm25: postings partial-aggregate, one qid window, no cartesian over data") {
    val p = plan("q_bm25_topk")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "tf/df must partial-aggregate")
    assert("\\bWindow\\b".r.findAllIn(p).size === 1, s"one top-k window expected:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("decontaminate: gram join carries hashes, no cartesian, no document payload") {
    val d = graft.ops.Tables.read(spark, dir, "documents")
    val p = graft.text.Decontaminate.flagContaminated(
      d.filter(org.apache.spark.sql.functions.col("doc_id") < 450),
      d.filter(org.apache.spark.sql.functions.col("doc_id") >= 450),
      "doc_id", "text", n = 3, minHits = 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"contamination must join on gram hashes, never cross:\n$p")
  }

  test("q_merge_upsert: winner-per-key is group-limited, change side broadcasts into the anti join") {
    val p = plan("q_merge_upsert")
    assert(p.contains("WindowGroupLimit"),
      s"rn=1 winner filter must push a group limit:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the snapshot-sized side must NOT shuffle for the anti join: the
    // (small) winner set broadcasts
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"anti join must broadcast the change batch:\n$p")
  }

  test("q_scd2_apply: change batch broadcasts into close-out and anti joins, no sort-merge") {
    val p = plan("q_scd2_apply")
    assert(!p.contains("SortMergeJoin"),
      s"dimension maintenance must not sort-merge a small change batch:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"both the close-out join and the anti join broadcast:\n$p")
  }

  test("q_boilerplate: boilerplate set broadcasts into the anti join, no cartesian") {
    val p = plan("q_boilerplate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftAnti"), s"stripping is an anti join:\n$p")
  }

  test("q_lm_score: count tables partial-aggregate; only the 1-row vocab crosses") {
    val p = plan("q_lm_score")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"bigram/unigram counts must partial-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"nothing data-sized may cross-join:\n$p")
  }

  test("q_quality_audit: all metrics from ONE scan, no join") {
    val p = plan("q_quality_audit")
    assert("FileScan".r.findAllIn(p).size === 1,
      s"the audit must profile every column in a single pass:\n$p")
    assert(!p.contains("Join"), s"audit must not join:\n$p")
  }

  test("q_epoch_order: pure per-row map+explode — no hash exchange, no join") {
    val p = plan("q_epoch_order")
    assert(!p.contains("Exchange hashpartitioning"),
      s"epoch ordering must run at scan speed:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q_funnel: per-step joins+aggs all hash on the user key, no cartesian, no window") {
    val p = plan("q_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"step candidates must die in partial aggregation:\n$p")
    // out-of-horizon events are filtered during the agg, not via a
    // time-range self-join
    assert(!p.contains("\bWindow\b"), s"funnel is join+agg, not a window:\n$p")
  }

  test("q_anomaly: one Window over the user key, no join, no explode") {
    val p = plan("q_anomaly")
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows === 1, s"one bounded-frame window expected:\n$p")
    assert(!p.contains("Join"), p)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1, s"baseline stats must reuse the single key exchange:\n$p")
  }

  test("q_token_entropy: two-level partial aggregation, no join, no cartesian") {
    val p = plan("q_token_entropy")
    assert(!p.contains("Join"), s"entropy is a pure aggregation chain:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"(id, token) and id levels must both partial-aggregate:\n$p")
  }

  test("q_retention: user-keyed aggs, hash joins only, no cartesian") {
    val p = plan("q_retention")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"anchors and activity must partial-aggregate on the user key:\n$p")
  }

  test("q_agg_upsert: pure aggregation chain — both sides partial-aggregate, no join") {
    val p = plan("q_agg_upsert")
    assert(!p.contains("Join"), s"the rollup merge is a union+groupBy, not a join:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"history, batch, and merge levels must all partial-aggregate:\n$p")
  }

  test("q_neg_sample: pool is TakeOrderedAndProject + broadcast; rank filter group-limits") {
    val p = plan("q_neg_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"the md5-bottom pool must plan as top-k, not a global sort:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only the bounded pool may cross (as a broadcast):\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the per-query k-cut must push a group limit:\n$p")
  }

  test("q_zorder: key computation is a pure per-row map — only the output sort exchanges") {
    val p = plan("q_zorder")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the z key must compute at scan speed:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q_quantize_int8: per-row array work, no hash exchange, no join") {
    val p = plan("q_quantize_int8")
    assert(!p.contains("Exchange hashpartitioning"),
      s"quantization must ride the scan:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q_clustering/q_triangles: branches read the materialized edge list, never re-scan the corpus") {
    // GraphStats materializes the oriented edge list ONCE (localCheckpoint);
    // the degree branch, both wedge legs, and the triangle close must all
    // read those blocks. A documents.parquet FileScan in the final plan
    // means a branch re-executes the corpus-scale simhash chain — the
    // round-8 recompute defect (8 scans, 18 exchanges) this net pins shut.
    for (q <- Seq("q_clustering", "q_triangles")) {
      val p = plan(q)
      assert(!p.contains("FileScan"),
        s"$q must not re-scan the corpus per plan branch:\n$p")
      assert("Scan ExistingRDD".r.findAllIn(p).size >= 3,
        s"$q branches must read the checkpointed edge list:\n$p")
      val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(hashEx <= 7, s"$q exchange count regressed (was 18 pre-fix, 7 post):\n$p")
    }
  }

  test("q_semantic_dedup: all branches read the checkpointed index — one argmax pass total") {
    // The verdict has FIVE consumers of the assignment (cell sizes ×2,
    // both pair-join sides, the join-back); without the materialization
    // each re-runs the k-dot-products argmax over the corpus.
    val p = plan("q_semantic_dedup")
    assert(!p.contains("FileScan"),
      s"a FileScan means a branch re-runs the centroid argmax over the corpus:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 4,
      s"branches must read the checkpointed index blocks:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_pq_encode: compression is one narrow codegen pass — no hash exchange, no join") {
    val p = plan("q_pq_encode")
    assert(!p.contains("Exchange hashpartitioning"),
      s"PQ encode must ride the scan:\n$p")
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
  }

  test("q_ann_pq: LUT broadcasts, scores partial-aggregate, no cartesian") {
    val p = plan("q_ann_pq")
    assert(p.contains("BroadcastHashJoin"),
      s"the |q|·m·ksub LUT must broadcast into the code stream:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"ADC sums must partial-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_repetition_gate: one corpus scan feeds all gram widths via chained generators") {
    val p = plan("q_repetition_gate")
    // scan 1: the multi-width generator chain; scan 2: the id×width grid
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      s"per-width rescans regressed the single-pass design:\n$p")
    assert("Generate".r.findAllIn(p).size >= 2,
      s"expected chained posexplode/explode generators:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_wav_frames: PCM decode is mapPartitions at scan speed — no hash exchange") {
    val p = plan("q_wav_frames")
    assert(!p.contains("Exchange hashpartitioning"),
      s"frame analysis must not shuffle sample rows:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q_pagerank: iterations read checkpointed blocks, never re-run the pair chain") {
    // rankMicro localCheckpoints the symmetrized edge list BEFORE it
    // branches (degree + join), and each iteration's rank vector after
    // its groupBy — the final plan must read materialized blocks only.
    val p = plan("q_pagerank")
    assert(!p.contains("FileScan") && !p.contains("Scan parquet"),
      s"a corpus scan in the final plan means an iteration re-runs the simhash chain:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"expected the checkpointed final rank vector:\n$p")
  }

  test("q_substr_spans: single corpus scan; span counting is one window over the hash") {
    val p = plan("q_substr_spans")
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"the groupBy+join-back form re-scans the corpus; the window form must not:\n$p")
    assert("\\bWindow\\b".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q_dataset_fingerprint: one scan, partial+final aggregation, nothing else") {
    val p = plan("q_dataset_fingerprint")
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"bit_xor/count fold must partial-aggregate map-side:\n$p")
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_orderstatus:string>"), s"fingerprint must prune to the 3 hashed columns:\n$p")
  }

  test("q_snapshot_diff: two metadata-sized folds joined — no row-level cross-snapshot join") {
    val p = plan("q_snapshot_diff")
    assert("Scan parquet".r.findAllIn(p).size === 2,
      s"each snapshot folds from exactly one scan:\n$p")
    // the only join is bucket-level: both sides are aggregated folds,
    // so every join input sits BELOW an aggregate in the plan tree
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r.findAllIn(p).size === 1,
      s"exactly one (bucket-level) join expected:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"both snapshots must fold via partial+final aggregation before the join:\n$p")
  }

  test("q_zone_prune: probes broadcast against aggregated zone maps, never against rows") {
    val p = plan("q_zone_prune")
    // lineitem is scanned once per layout (two zone maps), nothing more
    assert("Scan parquet".r.findAllIn(p).size === 2, p)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the probe list is a broadcast predicate sweep:\n$p")
    // every BNLJ input is a zone map (post-aggregation): the plan has
    // 2 layouts × (partial+final) aggs before the joins + final aggs
    assert("HashAggregate".r.findAllIn(p).size >= 6, p)
    // column pruning: the range-layout zone build reads ONLY l_shipdate;
    // the hash layout additionally needs the bucketing key
    assert("ReadSchema: struct<l_shipdate:timestamp(_ntz)?>".r.findFirstIn(p).isDefined,
      s"range-layout zone build must prune to the 1 probed column:\n$p")
    assert("ReadSchema: struct<l_orderkey:bigint,l_shipdate:timestamp(_ntz)?>".r.findFirstIn(p).isDefined,
      s"hash-layout zone build must prune to 2 of 11 lineitem columns:\n$p")
  }

  test("q_compaction_plan: metadata-only plan — one scan, one window, partial aggs") {
    val p = plan("q_compaction_plan")
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert("\\bWindow\\b".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"),
      s"listing derivation must prune to 3 of 5 document columns:\n$p")
  }

  test("q_winnow/q_cdc_chunks: one corpus scan each; selection is local (window / agg)") {
    val pw = plan("q_winnow")
    assert("Scan parquet".r.findAllIn(pw).size === 1, pw)
    assert("\\bWindow\\b".r.findAllIn(pw).size === 1, pw)
    assert(!pw.contains("Join"), pw)
    val pc = plan("q_cdc_chunks")
    assert("Scan parquet".r.findAllIn(pc).size === 1,
      s"explode_outer keeps short docs without a join-back re-scan:\n$pc")
    assert(!pc.contains("Join"), pc)
    assert("HashAggregate".r.findAllIn(pc).size >= 2, pc)
  }

  test("q_bpe_merges: one scan, map-side combine, top-k via TakeOrdered") {
    val p = plan("q_bpe_merges")
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"pair counts must partial-aggregate before the shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not globally sort the vocabulary:\n$p")
  }

  test("q_wordpiece_encode: the piece table is the BUILD side, never the corpus") {
    // regression net for the round-13 bug class: the checkpoint-backed
    // word->pieces table has opaque stats, and the planner once chose
    // BuildLeft — broadcasting the EXPLODED CORPUS (110 s at 100×)
    val p = plan("q_wordpiece_encode")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BuildRight"),
      s"the vocabulary-sized encode table must be the broadcast build side:\n$p")
    assert(!p.contains("BuildLeft"), s"corpus side must never build:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_topk_sketch: global batch summaries ride TakeOrderedAndProject") {
    val p = plan("q_topk_sketch")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-(k+1) must be the distributed primitive, not a global sort of all items:\n$p")
  }
}
