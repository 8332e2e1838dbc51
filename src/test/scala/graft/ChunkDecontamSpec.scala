package graft

import org.apache.spark.sql.functions._

import graft.text.{Chunker, Decontaminate, TextAnalysis}

class ChunkDecontamSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------------
  // Decontamination
  // ------------------------------------------------------------------

  private lazy val train = Seq(
    (0L, "alpha beta gamma delta epsilon"),           // shares "beta gamma delta" with bench
    (1L, "one two three four five six"),              // clean
    (2L, "too short"),                                // < 3 tokens: zero grams
    (3L, "zeta beta gamma delta eta beta gamma delta")// two gram hits (distinct grams)
  ).toDF("doc_id", "text")

  private lazy val bench = Seq(
    (100L, "prefix beta gamma delta suffix"),
    (101L, "totally unrelated benchmark prompt text")
  ).toDF("doc_id", "text")

  test("ngramsFromTokens: sliding 3-grams; short docs yield none") {
    val g = train
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
      .select(col("doc_id"), Decontaminate.ngramsFromTokens(col("tk"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(g(0L) === Seq("alpha beta gamma", "beta gamma delta", "gamma delta epsilon"))
    assert(g(2L) === Seq.empty)
  }

  test("flagContaminated: hit counts, overlap, short docs clean, all ids present") {
    val rep = Decontaminate.flagContaminated(train, bench, "doc_id", "text",
      n = 3, minHits = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(rep.keySet === Set(0L, 1L, 2L, 3L))
    // doc 0: 3 grams, 1 matches the bench ("beta gamma delta")
    assert(rep(0L) === ((3L, 1L, 0.333333, true)))
    // doc 1: 4 grams, none match
    assert(rep(1L) === ((4L, 0L, 0.0, false)))
    // doc 2: too short for any 3-gram — clean by definition, not an error
    assert(rep(2L) === ((0L, 0L, 0.0, false)))
    // doc 3: grams are distinct-per-doc; exactly one distinct gram matches
    assert(rep(3L)._2 === 1L)
    assert(rep(3L)._4)
  }

  test("removeContaminated: anti-join keeps exactly the clean docs") {
    val kept = Decontaminate.removeContaminated(train, bench, "doc_id", "text",
      n = 3, minHits = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("flagContaminated at minHits=2: single-gram overlap no longer flags") {
    val rep = Decontaminate.flagContaminated(train, bench, "doc_id", "text",
      n = 3, minHits = 2)
      .filter(col("contaminated")).select("id").as[Long].collect()
    assert(rep.isEmpty)
  }

  // ------------------------------------------------------------------
  // Chunking
  // ------------------------------------------------------------------

  private lazy val chunkDocs = Seq(
    (0L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
    (1L, "a b"),                           // shorter than one chunk
    (2L, (0 until 9).map(i => s"x$i").mkString(" ")) // exactly size+overlap boundary
  ).toDF("doc_id", "text")

  // ------------------------------------------------------------------
  // Fuzzy (MinHash-LSH) decontamination
  // ------------------------------------------------------------------

  test("flagNearContaminated catches a light edit the exact 13-gram pass misses") {
    // fBench(100) is 20 tokens; fTrain(0) edits position 9 — EVERY
    // 13-token window contains the edit, so no 13-gram survives (the
    // production exact pass scores zero hits), while 15 of 18 shingles
    // and 19/21 of the token set survive (Jaccard ≈ 0.905) — the
    // "benchmark answer with one word swapped" case fuzzy decontam
    // exists for
    val benchToks = (0 until 20).map(i => s"a$i")
    val trainToks = benchToks.updated(9, "xx")
    val fTrain = Seq(
      (0L, trainToks.mkString(" ")),
      (1L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val fBench = Seq((100L, benchToks.mkString(" "))).toDF("doc_id", "text")
    val exact = Decontaminate.flagContaminated(fTrain, fBench, "doc_id", "text",
      n = 13, minHits = 1).filter(col("contaminated"))
      .collect().map(_.getLong(0)).toSet
    assert(exact === Set.empty[Long])
    val fuzzy = Decontaminate.flagNearContaminated(fTrain, fBench, "doc_id", "text",
      threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(fuzzy.keySet === Set(0L))
    assert(fuzzy(0L)._1 === 1L)
    assert(math.abs(fuzzy(0L)._2 - 19.0 / 21.0) < 1e-12)
  }

  test("flagNearContaminated: a train id numerically equal to a bench id is NOT skipped") {
    // same numeric id 7 on both sides with identical text — the prefix
    // remap must keep the pair (the raw two-table LSH drops equal ids)
    val fTrain = Seq((7L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val fBench = Seq((7L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val fuzzy = Decontaminate.flagNearContaminated(fTrain, fBench, "doc_id", "text",
      threshold = 0.9).collect()
    assert(fuzzy.map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("flagNearContaminated recall: every planted single-edit near-dup is caught") {
    // 20 benchmark docs of 24-40 tokens; each train doc copies one with
    // a single mid-doc word swapped — every one must be flagged, and
    // the 5 clean train docs must not be
    val benches = (0 until 20).map { d =>
      val len = 24 + (d % 5) * 4
      (100L + d, (0 until len).map(i => s"b${d}w$i").mkString(" "))
    }
    val planted = benches.zipWithIndex.map { case ((bid, text), d) =>
      val toks = text.split(" ")
      (d.toLong, toks.updated(toks.length / 2, "EDIT").mkString(" "))
    }
    val clean = (50L until 55L).map(i =>
      (i, (0 until 30).map(j => s"c${i}w$j").mkString(" ")))
    val fTrain = (planted ++ clean).toDF("doc_id", "text")
    val fBench = benches.toDF("doc_id", "text")
    // the wrapper's recall posture (16×1 banding, estimate prefilter
    // disabled) is load-bearing here: this same fixture measured 16/20
    // under dedup-style 4×4 banding + prefilter, because the
    // Kirsch–Mitzenmacher family's slot agreement is bimodal — doc 0
    // realizes 1/16 agreeing slots at true token-J 0.92 (one unshared
    // shingle with a small h2 sweeps every g_i minimum)
    val flagged = graft.text.Decontaminate.flagNearContaminated(
      fTrain, fBench, "doc_id", "text", threshold = 0.85)
      .collect().map(_.getLong(0)).toSet
    assert(flagged === (0L until 20L).toSet,
      s"recall failure: missed ${(0L until 20L).toSet -- flagged}, false ${flagged -- (0L until 20L).toSet}")
  }

  test("indexed fuzzy decontam ≡ from-raw; erase via the index verbs") {
    val benches = (0 until 6).map { d =>
      (100L + d, (0 until 24).map(i => s"b${d}w$i").mkString(" "))
    }
    val planted = benches.take(3).zipWithIndex.map { case ((_, text), d) =>
      val toks = text.split(" ")
      (d.toLong, toks.updated(12, "EDIT").mkString(" "))
    }
    val fTrain = (planted :+ (50L, (0 until 30).map(j => s"cw$j").mkString(" ")))
      .toDF("doc_id", "text")
    val fBench = benches.toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("fz_idx").resolve("idx").toString
    graft.text.Decontaminate.writeBenchIndex(fBench, "doc_id", "text", idx)
    val indexed = graft.text.Decontaminate.flagNearContaminatedAgainstIndex(
      fTrain, idx, "doc_id", "text", threshold = 0.85)
      .orderBy("id").collect().toSeq
    val fromRaw = graft.text.Decontaminate.flagNearContaminated(
      fTrain, fBench, "doc_id", "text", threshold = 0.85)
      .orderBy("id").collect().toSeq
    assert(indexed === fromRaw)
    assert(indexed.map(_.getLong(0)) === Seq(0L, 1L, 2L))
    // erase benchmark item 100 from the index (raw bench id — the verb
    // prefixes internally): train doc 0 (its near-dup) is no longer
    // flagged
    import spark.implicits._
    graft.text.Decontaminate.deleteFromBenchIndex(Seq(100L).toDF("doc_id"), idx)
    val afterErase = graft.text.Decontaminate.flagNearContaminatedAgainstIndex(
      fTrain, idx, "doc_id", "text", threshold = 0.85)
      .collect().map(_.getLong(0)).toSet
    assert(afterErase === Set(1L, 2L))
    // the filter form keeps exactly the complement
    val kept = graft.text.Decontaminate.removeNearContaminatedAgainstIndex(
      fTrain, idx, "doc_id", "text", threshold = 0.85)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 50L))
    // append a NEW benchmark item that train doc 50 copies: the stored
    // banding/buckets come off meta, and the next probe flags doc 50
    val extra = Seq((200L, (0 until 30).map(j => s"cw$j")
      .updated(15, "EDIT").mkString(" "))).toDF("doc_id", "text")
    graft.text.Decontaminate.appendBenchIndex(extra, "doc_id", "text", idx)
    val afterAppend = graft.text.Decontaminate.flagNearContaminatedAgainstIndex(
      fTrain, idx, "doc_id", "text", threshold = 0.85)
      .collect().map(_.getLong(0)).toSet
    assert(afterAppend === Set(1L, 2L, 50L))
    // a probe with banding different from the stored meta fails loudly
    // instead of silently hashing against other band boundaries
    val err = intercept[IllegalArgumentException] {
      graft.text.Decontaminate.flagNearContaminatedAgainstIndex(
        fTrain, idx, "doc_id", "text", bands = 4, rowsPerBand = 4)
    }
    assert(err.getMessage.contains("banding"))
  }

  test("handle-based fuzzy flag/remove ≡ the path-based indexed forms; tombstones honored") {
    val benches = (0 until 6).map { d =>
      (100L + d, (0 until 24).map(i => s"b${d}w$i").mkString(" "))
    }
    val planted = benches.take(3).zipWithIndex.map { case ((_, text), d) =>
      val toks = text.split(" ")
      (d.toLong, toks.updated(12, "EDIT").mkString(" "))
    }
    val fTrain = (planted :+ (50L, (0 until 30).map(j => s"cw$j").mkString(" ")))
      .toDF("doc_id", "text")
    val fBench = benches.toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("fz_idx_h").resolve("idx").toString
    graft.text.Decontaminate.writeBenchIndex(fBench, "doc_id", "text", idx)
    val h = graft.text.Decontaminate.openBenchIndex(spark, idx)
    val viaHandle = graft.text.Decontaminate.flagNearContaminatedAgainstHandle(
      fTrain, h, "doc_id", "text", threshold = 0.85)
      .orderBy("id").collect().toSeq
    val viaPath = graft.text.Decontaminate.flagNearContaminatedAgainstIndex(
      fTrain, idx, "doc_id", "text", threshold = 0.85)
      .orderBy("id").collect().toSeq
    assert(viaHandle === viaPath)
    assert(viaHandle.map(_.getLong(0)) === Seq(0L, 1L, 2L))
    assert(graft.text.Decontaminate.removeNearContaminatedAgainstHandle(
        fTrain, h, "doc_id", "text", threshold = 0.85)
      .collect().map(_.getLong(0)).toSet === Set(50L))
    // the handle is a point-in-time snapshot: tombstones written BEFORE
    // open are honored, exactly like the path variant
    import spark.implicits._
    graft.text.Decontaminate.deleteFromBenchIndex(Seq(100L).toDF("doc_id"), idx)
    val h2 = graft.text.Decontaminate.openBenchIndex(spark, idx)
    assert(graft.text.Decontaminate.flagNearContaminatedAgainstHandle(
        fTrain, h2, "doc_id", "text", threshold = 0.85)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("indexed fuzzy decontam probe prunes the stored band read to its own buckets") {
    val fBench = (0 until 6).map { d =>
      (100L + d, (0 until 24).map(i => s"b${d}w$i").mkString(" "))
    }.toDF("doc_id", "text")
    // ONE short train doc → few band hashes → strictly fewer than all 8
    // buckets probed; the bands scan must carry a PartitionFilters
    // bbucket restriction (partition pruning, not a full-table read)
    val fTrain = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("fz_prune").resolve("idx").toString
    graft.text.Decontaminate.writeBenchIndex(fBench, "doc_id", "text", idx, nBuckets = 8)
    val plan = graft.text.Decontaminate.flagNearContaminatedAgainstIndex(
      fTrain, idx, "doc_id", "text", threshold = 0.85)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bbucket".r.findFirstIn(plan).isDefined,
      s"stored band read must prune to the batch's buckets:\n$plan")
  }

  test("flagNearContaminatedChunked: an EDITED answer EMBEDDED in a long doc is caught") {
    // benchmark item: 20 tokens. train doc 0: 200 filler tokens with the
    // item (one word edited) spliced in at position 100 — the
    // containment case: whole-doc token-Jaccard vs the item is ~19/201
    // (invisible to flagNearContaminated at any sane threshold) and the
    // single edit kills every exact 13-gram window
    val item = (0 until 20).map(i => s"a$i")
    val edited = item.updated(9, "EDIT")
    val filler = (0 until 200).map(i => s"f$i")
    val fTrain = Seq(
      (0L, (filler.take(100) ++ edited ++ filler.drop(100)).mkString(" ")),
      (1L, (0 until 220).map(i => s"g$i").mkString(" ")) // clean, same length
    ).toDF("doc_id", "text")
    val fBench = Seq((100L, item.mkString(" "))).toDF("doc_id", "text")
    // whole-doc fuzzy: invisible
    val wholeDoc = Decontaminate.flagNearContaminated(
      fTrain, fBench, "doc_id", "text", threshold = 0.5)
      .collect()
    assert(wholeDoc.isEmpty, "containment must NOT be visible to whole-doc Jaccard")
    // exact 13-grams: invisible (every window contains the edit)
    val exact = Decontaminate.flagContaminated(fTrain, fBench, "doc_id", "text",
      n = 13, minHits = 1).filter(col("contaminated")).collect()
    assert(exact.isEmpty)
    // chunked fuzzy: the 20-token window bracketing the splice sees
    // 19/21 ≈ 0.905 — caught; the clean doc stays clean
    val chunked = Decontaminate.flagNearContaminatedChunked(
      fTrain, fBench, "doc_id", "text", chunkSize = 20, stride = 5,
      threshold = 0.85)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(chunked.keySet === Set(0L))
    assert(chunked(0L)._1 === 1L) // one distinct bench item, however many windows hit
    assert(chunked(0L)._2 >= 19.0 / 21.0 - 1e-9)
    // the filter form drops exactly the containment-flagged doc
    val kept = Decontaminate.removeNearContaminatedChunked(
      fTrain, fBench, "doc_id", "text", chunkSize = 20, stride = 5,
      threshold = 0.85)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
  }

  test("flagNearContaminatedChunked: several windows hitting ONE item count once") {
    // the item appears twice in the train doc → multiple windows match,
    // but n_bench_matches is per DISTINCT benchmark item
    val item = (0 until 20).map(i => s"a$i")
    val filler = (0 until 60).map(i => s"f$i")
    val fTrain = Seq(
      (0L, (item ++ filler ++ item).mkString(" "))
    ).toDF("doc_id", "text")
    val fBench = Seq((100L, item.mkString(" "))).toDF("doc_id", "text")
    val got = Decontaminate.flagNearContaminatedChunked(
      fTrain, fBench, "doc_id", "text", chunkSize = 20, stride = 10,
      threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0L)._1 === 1L)
    assert(got(0L)._2 === 1.0) // the aligned window matches exactly
  }

  test("chunked decontam against the stored index ≡ from-raw") {
    val item = (0 until 20).map(i => s"a$i")
    val edited = item.updated(9, "EDIT")
    val filler = (0 until 200).map(i => s"f$i")
    val fTrain = Seq(
      (0L, (filler.take(100) ++ edited ++ filler.drop(100)).mkString(" ")),
      (1L, (0 until 220).map(i => s"g$i").mkString(" "))
    ).toDF("doc_id", "text")
    val fBench = Seq((100L, item.mkString(" ")),
      (101L, (0 until 20).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("fzc_idx").resolve("idx").toString
    graft.text.Decontaminate.writeBenchIndex(fBench, "doc_id", "text", idx)
    val indexed = graft.text.Decontaminate.flagNearContaminatedChunkedAgainstIndex(
      fTrain, idx, "doc_id", "text", chunkSize = 20, stride = 5, threshold = 0.85)
      .orderBy("id").collect().toSeq
    val fromRaw = graft.text.Decontaminate.flagNearContaminatedChunked(
      fTrain, fBench, "doc_id", "text", chunkSize = 20, stride = 5, threshold = 0.85)
      .orderBy("id").collect().toSeq
    assert(indexed === fromRaw)
    assert(indexed.map(_.getLong(0)) === Seq(0L))
    // erase the matched item: the containment flag disappears
    import spark.implicits._
    graft.text.Decontaminate.deleteFromBenchIndex(Seq(100L).toDF("doc_id"), idx)
    val afterErase = graft.text.Decontaminate.flagNearContaminatedChunkedAgainstIndex(
      fTrain, idx, "doc_id", "text", chunkSize = 20, stride = 5, threshold = 0.85)
      .collect()
    assert(afterErase.isEmpty)
  }

  test("removeNearContaminated: anti-join keeps exactly the unflagged docs") {
    val fTrain = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val fBench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val kept = Decontaminate.removeNearContaminated(fTrain, fBench, "doc_id", "text",
      threshold = 0.9).collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
  }

  test("chunk: stride windows cover the token stream; last chunk short; overlap correct") {
    val c = Chunker.chunk(chunkDocs, "doc_id", "text", chunkSize = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3)))).toMap
    // doc 0: starts 0,3,6,9 → nc = ceil((10-4)/3)+1 = 3
    assert(c((0L, 0)) === ((4, "t0 t1 t2 t3")))
    assert(c((0L, 1)) === ((4, "t3 t4 t5 t6")))
    assert(c((0L, 2)) === ((4, "t6 t7 t8 t9")))
    assert(!c.contains((0L, 3)))
    // doc 1: one under-full chunk
    assert(c((1L, 0)) === ((2, "a b")))
    // doc 2 (9 tokens): nc = ceil(5/3)+1 = 3; last chunk starts at token 7
    assert(c((2L, 2)) === ((3, "x6 x7 x8")))
  }

  test("chunk: stride == chunkSize partitions the stream exactly") {
    val c = Chunker.chunk(chunkDocs.filter(col("doc_id") === 0), "doc_id", "text",
      chunkSize = 5, stride = 5)
      .orderBy("chunk_idx").collect()
    assert(c.length === 2)
    assert(c.map(_.getString(3)).toSeq === Seq("t0 t1 t2 t3 t4", "t5 t6 t7 t8 t9"))
    // no token lost or duplicated
    assert(c.map(_.getInt(2)).sum === 10)
  }

  // ------------------------------------------------------------------
  // Packing
  // ------------------------------------------------------------------

  test("packBins: first-fit-in-order by start offset within each stream") {
    val docs = Seq(
      ("s1", 1L, Seq.fill(6)("w").mkString(" ")),  // start 0  → bin 0
      ("s1", 2L, Seq.fill(6)("w").mkString(" ")),  // start 6  → bin 0
      ("s1", 3L, Seq.fill(6)("w").mkString(" ")),  // start 12 → bin 1
      ("s2", 4L, Seq.fill(11)("w").mkString(" ")), // start 0  → bin 0 (own stream)
      ("s2", 5L, Seq.fill(1)("w").mkString(" "))   // start 11 → bin 1
    ).toDF("source", "doc_id", "text")
    val bins = Chunker.packBins(docs, "doc_id", "text", "source", budget = 10L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(bins === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L, 5L -> 1L))
  }

  test("renderBins: in-order concatenation, deterministic under repartition") {
    val docs = Seq(
      ("s1", 1L, "a a a a a a"),
      ("s1", 2L, "b b b b b b"),
      ("s1", 3L, "c c c c c c"),
      ("s2", 4L, "d d")
    ).toDF("source", "doc_id", "text")
    def render(d: org.apache.spark.sql.DataFrame) =
      Chunker.renderBins(d, "doc_id", "text", "source", budget = 10L)
        .orderBy("source", "bin")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSeq
    val want = Seq(
      ("s1", 0L, 2L, 12L, "a a a a a a <eod> b b b b b b"),
      ("s1", 1L, 1L, 6L, "c c c c c c"),
      ("s2", 0L, 1L, 2L, "d d"))
    assert(render(docs) === want)
    // collect_list arrival order changes under repartition; the
    // struct-sort must keep the rendered text identical
    assert(render(docs.repartition(7)) === want)
  }

  // ------------------------------------------------------------------
  // Chunk-granular substring dedup
  // ------------------------------------------------------------------

  test("dedupChunks: global keep-first, reassembly in order, emptied docs survive") {
    val docs = Seq(
      (1L, "a b c d"),   // both chunks first occurrences
      (2L, "a b x y"),   // "a b" loses to doc 1 → only "x y" survives
      (3L, "c d"),       // whole doc is a repeat of doc 1's tail → emptied
      (4L, "z z z z")    // within-doc repeat: second "z z" dropped
    ).toDF("doc_id", "text")
    val got = Chunker.dedupChunks(docs, "doc_id", "text", chunkSize = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("kept_chunks"), r.getAs[String]("text_dedup")))).toMap
    assert(got === Map(
      1L -> ((2L, "a b c d")),
      2L -> ((1L, "x y")),
      3L -> ((0L, "")),
      4L -> ((1L, "z z"))))
  }

  test("dedupChunks: keep-first rank plans as WindowGroupLimit (hot-key shuffle bound)") {
    val docs = Seq((1L, "a b c d"), (2L, "a b x y")).toDF("doc_id", "text")
    val p = Chunker.dedupChunks(docs, "doc_id", "text", chunkSize = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rn=1 must push a map-side group limit so boilerplate chunks don't flood the exchange:\n$p")
  }

  test("dedupChunks: a clean corpus passes through byte-identical") {
    val docs = Seq((1L, "p q r s"), (2L, "t u v w")).toDF("doc_id", "text")
    val got = Chunker.dedupChunks(docs, "doc_id", "text", chunkSize = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("text_dedup")).toMap
    assert(got === Map(1L -> "p q r s", 2L -> "t u v w"))
  }
}
