package graft

import org.apache.spark.sql.functions._

import graft.dedup.NearDup
import graft.text.TextAnalysis

class NearDupSpec extends SparkTestBase {
  import spark.implicits._

  // a corpus with known structure: 2 exact dups, 2 near-dups, distinct rest
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (3L, "completely different content about database engines and query optimizers"),
    (4L, "completely different content about database engines and query planners"), // near-dup of 3
    (5L, "unrelated text mentioning machine learning training pipelines at scale")
  ).toDF("doc_id", "text")

  test("exactGroups: dup group keyed by content hash, min id kept") {
    val g = NearDup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length === 5)
    val dupGroup = g.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dupGroup.getAs[Long]("keeper_id") === 0L)
  }

  test("jaccard: exact token-set similarity") {
    val d = docs.select(col("doc_id"), array_distinct(TextAnalysis.tokens(col("text"))).as("t"))
    val a = d.filter(col("doc_id") === 0).select(col("t").as("ta"))
    val b = d.filter(col("doc_id") === 2).select(col("t").as("tb"))
    val j = a.crossJoin(b).select(NearDup.jaccard(col("ta"), col("tb"))).head().getDouble(0)
    // tokens0 = 12 distinct (incl 'today'), tokens2 swaps today→tonight:
    // inter=11, union=13
    assert(math.abs(j - 11.0 / 13.0) < 1e-12)
  }

  test("minHashLsh: finds the exact dup and high-jaccard near-dups, no junk") {
    val pairs = NearDup.minHashLsh(docs, "doc_id", "text",
      bands = 8, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup must be found")
    // near-dup 0↔2 has shingle-jaccard high enough for 8 bands of 2 to hit
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "unrelated doc must not pair")
  }

  test("minHashLsh candidates never miss pairs above threshold (recall vs exact)") {
    // exhaustive exact jaccard over all pairs of the small corpus
    val d = docs.select(col("doc_id"), array_distinct(TextAnalysis.tokens(col("text"))).as("t"))
    val l = d.select(col("doc_id").as("id_a"), col("t").as("ta"))
    val r = d.select(col("doc_id").as("id_b"), col("t").as("tb"))
    val exact = l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), NearDup.jaccard(col("ta"), col("tb")).as("j"))
      .filter(col("j") >= 0.9)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val lsh = NearDup.minHashLsh(docs, "doc_id", "text",
      bands = 8, rowsPerBand = 2, threshold = 0.9)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // at j>=0.9 with 8 bands × 2 rows, per-band hit prob >= 0.81 → miss
    // prob <= (1-0.81)^8 ≈ 3e-6; this fixture must achieve full recall
    assert(exact.subsetOf(lsh), s"missed: ${exact -- lsh}")
  }

  test("minHashLshAgainstCorpus: batch pairs against history only, agrees with full LSH") {
    val batch = docs.filter(col("doc_id") < 2)   // 0 (≈2), 1 (exact of 0)
    val seen = docs.filter(col("doc_id") >= 2)   // 2, 3, 4, 5
    val inc = NearDup.minHashLshAgainstCorpus(batch, seen, "doc_id", "text",
      bands = 8, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("seen_id"))).toSet
    // only cross pairs: batch docs 0,1 near-dup seen doc 2; the 0↔1 exact
    // pair is WITHIN the batch and must not appear (that's minHashLsh's job)
    assert(inc === Set((0L, 2L), (1L, 2L)))
    // cross-pair agreement with the full self-LSH at the same knobs
    val full = NearDup.minHashLsh(docs, "doc_id", "text",
      bands = 8, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    inc.foreach { case (n, s) =>
      assert(full.contains((math.min(n, s), math.max(n, s))),
        s"incremental pair ($n,$s) must exist in the full pairing") }
  }

  test("dedupNearAgainstCorpus: batch minus near-dups of history") {
    val batch = docs.filter(col("doc_id") < 2)
    val seen = docs.filter(col("doc_id") >= 2)
    val kept = NearDup.dedupNearAgainstCorpus(batch, seen, "doc_id", "text",
      bands = 8, rowsPerBand = 2, threshold = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set.empty, "both batch docs near-duplicate seen doc 2")
    // a clean batch passes through untouched
    val clean = NearDup.dedupNearAgainstCorpus(
      docs.filter(col("doc_id") === 5), docs.filter(col("doc_id") < 4),
      "doc_id", "text", bands = 8, rowsPerBand = 2, threshold = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(clean === Set(5L))
  }

  test("simHash: identical docs equal hashes; near-dups within small hamming") {
    val sims = NearDup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(0L) === sims(1L), "exact dups must have identical simhash")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sims(0L), sims(2L)) < hamming(sims(0L), sims(5L)),
      "near-dup must be closer than unrelated doc")
  }

  test("simHashNearDups: pigeonhole blocking finds all pairs within radius") {
    val sims = NearDup.simHash(docs, "doc_id", "text").cache()
    val all = sims.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- all.keys; b <- all.keys if a < b
      if java.lang.Long.bitCount(all(a) ^ all(b)) <= 7
    } yield (a, b)).toSet
    val found = NearDup.simHashNearDups(sims, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found === expected)
  }

  test("simHashNearDups: two-block combination regime is exhaustive at radius 8-14") {
    import spark.implicits._
    // synthetic simhashes at controlled distances from a base value:
    // flip exactly d bits for d in 0..16 — recall must be perfect ≤ radius
    // and the exact-hamming filter must exclude everything beyond it.
    val base = 0x0123456789abcdefL
    def flip(v: Long, bits: Seq[Int]): Long = bits.foldLeft(v)((x, b) => x ^ (1L << b))
    val rows = (0 to 16).map { d => (d.toLong, flip(base, (0 until d).map(i => (i * 7 + 3) % 64))) }
    val sims = rows.toDF("id", "simhash")
    Seq(8, 10, 14).foreach { h =>
      val all = rows.toMap
      val expected = (for {
        a <- all.keys; b <- all.keys if a < b
        if java.lang.Long.bitCount(all(a) ^ all(b)) <= h
      } yield (a, b)).toSet
      val found = NearDup.simHashNearDups(sims, maxHamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(found === expected, s"radius $h")
    }
  }

  test("MinHashSig expression == staged HOF construction, bit for bit") {
    // The fused codegen expression must reproduce the reference HOF chain
    // (one md5 per shingle, h1/h2 split, per-slot array_min) exactly —
    // the DuckDB oracle replays that construction digit-for-digit, so any
    // drift here would surface as a driver hash mismatch.
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), TextAnalysis.tokens(col("text")).as("tk"))
      .select(col("doc_id"), TextAnalysis.shinglesFromTokens(col("text"), col("tk")).as("sh"))
      .select(col("doc_id"),
        transform(col("sh"), s => md5(to_binary(s, lit("utf-8")))).as("ms"), col("sh"))
      .select(col("doc_id"), col("sh"), transform(col("ms"), m => struct(
        conv(substring(m, 1, 15), 16, 10).cast("long").as("h1"),
        conv(substring(m, 16, 14), 16, 10).cast("long").as("h2"))).as("hs"))
    val bad = d.select(
        graft.functions.MinHashSig.sig(col("sh"), 16).as("fast"),
        NearDup.minHashSignature(col("hs"), 16).as("ref"))
      .filter(not(col("fast") === col("ref"))).count()
    assert(bad === 0)
  }

  test("dedupAgainstCorpus: batch minus seen fingerprints, digests not text") {
    val seen = Seq((90L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (91L, "historical document unrelated to the new batch entirely")).toDF("doc_id", "text")
    val kept = NearDup.dedupAgainstCorpus(docs, seen, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    // docs 0 and 1 duplicate seen#90 exactly → dropped; near-dups (2, 4) are
    // NOT dropped — this operator is exact-only by contract
    assert(kept === Array(2L, 3L, 4L, 5L))
  }

  test("MinHashSig: null shingle elements are skipped, all-null yields null slots") {
    // Reachable: shinglesFromTokens falls back to array(text), which holds
    // one null element when text is null. The HOF reference form tolerated
    // it (array_min skips nulls); the fused expression must too, not NPE.
    val rows = Seq(
      (1L, Seq[String]("a b c", null)),       // null mixed with real shingle
      (2L, Seq[String](null)),                // all-null → null slots
      (3L, Seq[String]("a b c"))              // control
    ).toDF("id", "sh")
    val got = rows.select(col("id"), graft.functions.MinHashSig.sig(col("sh"), 4).as("sig"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Any](1)).toMap
    assert(got(1L) === got(3L))               // null element contributed nothing
    assert(got(2L).forall(_ == null))         // array_min of all-null is NULL
  }

  test("estPrefilter=false: the recall posture catches every planted single edit") {
    // the round-13 bimodal-slot probe: 20 bench docs of 24-40 tokens,
    // each train doc a single-mid-word edit of one — under dedup
    // defaults (4×4 banding + estimate prefilter) the Kirsch–
    // Mitzenmacher slot agreement is bimodal and the probe measured
    // 16/20; the documented recall knob (1-row bands, prefilter OFF)
    // must read 20/20 with zero false positives on the clean docs
    val benches = (0 until 20).map { d =>
      val len = 24 + (d % 5) * 4
      (100L + d, (0 until len).map(i => s"b${d}w$i").mkString(" "))
    }
    val planted = benches.zipWithIndex.map { case ((_, text), d) =>
      val toks = text.split(" ")
      (d.toLong, toks.updated(toks.length / 2, "EDIT").mkString(" "))
    }
    val clean = (50L until 55L).map(i =>
      (i, (0 until 30).map(j => s"c${i}w$j").mkString(" ")))
    val batch = (planted ++ clean).toDF("doc_id", "text")
    val seen = benches.toDF("doc_id", "text")
    val recall = NearDup.minHashLshAgainstCorpus(batch, seen, "doc_id", "text",
      bands = 16, rowsPerBand = 1, threshold = 0.85, estPrefilter = false)
      .select("new_id").collect().map(_.getLong(0)).toSet
    assert(recall === (0L until 20L).toSet,
      s"recall posture missed ${(0L until 20L).toSet -- recall}")
    // the cost posture on the same fixture is a SUBSET (never junk) —
    // and on this designed-borderline fixture a strict one, which is
    // exactly why the knob exists
    val cost = NearDup.minHashLshAgainstCorpus(batch, seen, "doc_id", "text",
      bands = 4, rowsPerBand = 4, threshold = 0.85)
      .select("new_id").collect().map(_.getLong(0)).toSet
    assert(cost.subsetOf(recall))
    assert(cost.size < 20, "fixture regression: the cost posture now reads 20/20, " +
      "so it no longer demonstrates the bimodal-slot miss this spec pins")
  }

  test("simHashNearDupsAgainstCorpus: cross pairs only, agrees with the self-join") {
    val sims = NearDup.simHash(docs, "doc_id", "text")
    val ids = sims.select("id").collect().map(_.getLong(0)).toSet
    val split = ids.toSeq.sorted.apply(ids.size / 2)
    val newS = sims.filter(col("id") < split)
    val seenS = sims.filter(col("id") >= split)
    val inc = NearDup.simHashNearDupsAgainstCorpus(newS, seenS, maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // ground truth: the (exhaustively spec-pinned) self-join restricted
    // to pairs crossing the split
    val full = NearDup.simHashNearDups(sims, maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter { case (a, b, _) => (a < split) != (b < split) }
      .map { case (a, b, h) => if (a < split) (a, b, h) else (b, a, h) }.toSet
    assert(inc === full)
    // overlapping id spaces: equal ids are skipped, not self-paired
    val overlap = NearDup.simHashNearDupsAgainstCorpus(sims, sims, maxHamming = 0)
      .filter(col("new_id") === col("seen_id")).count()
    assert(overlap === 0L)
  }

  test("simHashNearDups: unsupported radii are rejected, never a degenerate join") {
    val sims = NearDup.simHash(docs, "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      NearDup.simHashNearDups(sims, maxHamming = 15)
    }
    assert(e.getMessage.contains("unsupported"))
    intercept[IllegalArgumentException] {
      NearDup.simHashNearDups(sims, maxHamming = -1)
    }
  }
}
