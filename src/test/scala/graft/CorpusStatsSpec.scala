package graft

import org.apache.spark.sql.functions._

import graft.text.{CorpusStats, TextAnalysis}

class CorpusStatsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b a b a b"),        // 2-grams: ab,ba,ab,ba,ab → top "a b"=3 of 5, all dup
    (2L, "x y z w"),            // 3 distinct 2-grams, nothing repeats
    (3L, "solo"),               // < 2 tokens: no grams
    (4L, "p q p q r r p q")     // 7 grams: pq×3, qp, qr, rr, rp → dup occ 3
  ).toDF("doc_id", "text")

  test("repetitionStats: counts, top fraction, duplicate fraction") {
    val m = CorpusStats.repetitionStats(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(m(1L).getAs[Long]("n_ngrams") === 5L)
    assert(m(1L).getAs[Long]("top_ngram_count") === 3L)
    assert(m(1L).getAs[Double]("top_ngram_frac") === 0.6)
    assert(m(1L).getAs[Double]("dup_ngram_frac") === 1.0) // every gram occurs 2+
    assert(m(2L).getAs[Long]("n_ngrams") === 3L)
    assert(m(2L).getAs[Double]("dup_ngram_frac") === 0.0)
    assert(m(3L).getAs[Long]("n_ngrams") === 0L)          // too short to repeat
    assert(m(3L).getAs[Double]("top_ngram_frac") === 0.0)
    assert(m(4L).getAs[Long]("n_ngrams") === 7L)
    assert(m(4L).getAs[Long]("top_ngram_count") === 3L)
    assert(m(4L).getAs[Double]("dup_ngram_frac") === math.rint(3.0 / 7.0 * 1e6) / 1e6)
  }

  test("vocabulary: top-N by count with lexicographic tie-break, exact shares") {
    val d = Seq("b a a", "c b a").toDF("text") // a=3, b=2, c=1, total 6
    val v = CorpusStats.vocabulary(d, "text", topN = 2).collect()
    assert(v.map(_.getAs[String]("token")).toSeq === Seq("a", "b"))
    assert(v.map(_.getAs[Long]("occurrences")).toSeq === Seq(3L, 2L))
    assert(v.head.getAs[Double]("corpus_frac") === 0.5)
    // tie: equal counts ranked lexicographically
    val tied = CorpusStats.vocabulary(Seq("z y", "y z").toDF("text"), "text", 1).collect()
    assert(tied.head.getAs[String]("token") === "y")
  }

  test("tfIdfTopTerms: hand-computed scores, smoothed idf, token tie-break") {
    val d = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c d")).toDF("doc_id", "text")
    // N=3; df: a=2, b=1, c=2, d=1; idf(x) = ln((N+1)/(df+1)) + 1
    val got = CorpusStats.tfIdfTopTerms(d, "doc_id", "text", topK = 1)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("token"), r.getAs[Long]("tf"), r.getAs[Long]("df"),
          r.getAs[Double]("tfidf")))).toMap
    def s(tf: Long, df: Long) =
      math.rint(tf * (math.log(4.0 / (df + 1)) + 1.0) * 1e6) / 1e6
    assert(got(1L) === (("a", 2L, 2L, s(2, 2))))   // 2·idf(a) beats 1·idf(b)
    // doc 2: a and c tie exactly (same tf, same df) → token asc wins
    assert(got(2L) === (("a", 1L, 2L, s(1, 2))))
    assert(got(3L) === (("c", 3L, 2L, s(3, 2))))
  }

  test("tfIdfTopTerms: topK bounds per-doc rows, no doc exceeds its vocab") {
    val d = Seq((1L, "a b"), (2L, "x")).toDF("doc_id", "text")
    val rows = CorpusStats.tfIdfTopTerms(d, "doc_id", "text", topK = 5)
      .collect().groupBy(_.getAs[Long]("id")).view.mapValues(_.length).toMap
    assert(rows === Map(1L -> 2, 2L -> 1)) // k caps, short docs emit what they have
  }

  test("pmiBigrams: counts, unigram attach, hand-computed pmi, count-then-pair order") {
    val d = Seq("a b a b", "a b c").toDF("text")
    // T=7 tokens, TB=5 bigrams; counts: "a b"=3, "b a"=1, "b c"=1; a=3,b=3,c=1
    val got = CorpusStats.pmiBigrams(d, "text", minCount = 1, topN = 10).collect()
    assert(got.map(_.getAs[String]("pair")).toSeq === Seq("a b", "b a", "b c"))
    val ab = got.head
    assert(ab.getAs[Long]("pair_count") === 3L)
    assert(ab.getAs[Long]("c1") === 3L && ab.getAs[Long]("c2") === 3L)
    assert(ab.getAs[Double]("pmi") ===
      math.rint(math.log(3.0 * 7 * 7 / (5.0 * 3 * 3)) * 1e6) / 1e6)
    // minCount prunes the singleton tail before the joins
    val pruned = CorpusStats.pmiBigrams(d, "text", minCount = 2, topN = 10).collect()
    assert(pruned.map(_.getAs[String]("pair")).toSeq === Seq("a b"))
  }

  test("redactPii: each rule class, non-PII text untouched") {
    val got = Seq(
      "mail bob.smith+x@corp.example.org now",
      "host 192.168.0.1 up",
      "call +4915112345678 ok",
      "card 4111222233334444 used",
      "clean text stays clean",
      "short 12345678 digits survive" // 8 digits: below the \d{9,} floor
    ).toDF("t").select(TextAnalysis.redactPii(col("t")).as("r")).as[String].collect()
    assert(got(0) === "mail <EMAIL> now")
    assert(got(1) === "host <IP> up")
    assert(got(2) === "call <PHONE> ok")
    assert(got(3) === "card <NUM> used")
    assert(got(4) === "clean text stays clean")
    assert(got(5) === "short 12345678 digits survive")
  }

  test("sourceVocabOverlap: hand-computed jaccards, ordered pairs only") {
    val docs = Seq(
      (1L, "s1", "a b c"),
      (2L, "s1", "a d"),        // s1 vocab {a,b,c,d}
      (3L, "s2", "a b x"),      // s2 vocab {a,b,x}
      (4L, "s3", "y z")         // s3 vocab {y,z} — disjoint from s1
    ).toDF("doc_id", "source", "text")
    val out = CorpusStats.sourceVocabOverlap(docs, "source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // s1 ∩ s2 = {a,b} = 2; union = 4+3-2 = 5 → 0.4
    assert(out(("s1", "s2")) === ((4L, 3L, 2L, 0.4)))
    // disjoint pairs simply don't appear (no zero-row padding)
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s3")))
    // only src_a < src_b emitted — no mirror duplicates
    assert(out.keySet === Set(("s1", "s2")))
  }

  test("tokenEntropy: degenerate 0, uniform ln(n), half-and-half ln(2)") {
    val docs = Seq(
      (1L, "a a a a"),   // one token repeated: H = 0
      (2L, "a b c d"),   // all distinct: H = ln(4)
      (3L, "a a b b")    // two tokens twice: H = ln(2)
    ).toDF("doc_id", "text")
    val out = CorpusStats.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(out(1L) === ((4L, 0.0)))
    assert(out(2L)._2 === math.BigDecimal(math.log(4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(out(3L)._2 - math.log(2)) < 1e-5)
  }

  test("sourceKlDrift: single source diverges from itself by exactly zero") {
    val d = Seq((1L, "s0", "a b c"), (2L, "s0", "a a b")).toDF("doc_id", "source", "text")
    val out = CorpusStats.sourceKlDrift(d, "source", "text").collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("kl_sum_micro") === 0L,
      "every per-token ratio is 1, every quantized log is the integer 0")
    assert(out(0).getAs[Double]("kl_nats") === 0.0)
  }

  test("sourceKlDrift: identical distributions give zero, a skewed shard goes positive") {
    val d = Seq(
      (1L, "clean", "a b c d"), (2L, "clean", "a b c d"),
      (3L, "mirror", "a b c d"), (4L, "mirror", "d c b a"),
      (5L, "drifted", "z z z a")
    ).toDF("doc_id", "source", "text")
    val out = CorpusStats.sourceKlDrift(d, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("kl_nats")).toMap
    // clean and mirror both match each other but NOT the pooled corpus
    // (the pool contains z-mass they lack) → small positive; drifted is
    // far from the pool → much larger
    assert(out("clean") === out("mirror"), "same token multiset → same KL")
    assert(out("drifted") > out("clean"),
      s"the z-heavy shard must show more drift: $out")
    assert(out.values.forall(_ >= 0.0), s"KL against the pool is non-negative: $out")
  }

  test("sourceKlDrift replays the hand formula on a tiny corpus") {
    val d = Seq((1L, "p", "a a b"), (2L, "q", "b b b")).toDF("doc_id", "source", "text")
    // pooled: a=2, b=4, N=6. p: n_s=3 (a:2, b:1); q: n_s=3 (b:3)
    def term(cSw: Long, nS: Long, cW: Long, n: Long): Long =
      cSw * math.rint(math.log(cSw.toDouble * n / (nS.toDouble * cW)) * 1e6).toLong
    val expP = term(2, 3, 2, 6) + term(1, 3, 4, 6)
    val expQ = term(3, 3, 4, 6)
    val out = CorpusStats.sourceKlDrift(d, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("kl_sum_micro")).toMap
    assert(out("p") === expP)
    assert(out("q") === expQ)
  }
}
