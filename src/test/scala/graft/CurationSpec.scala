package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Curation

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  // hand fixture: each stage has a designated casualty
  //  1,2 share a canonical URL (utm param) -> 2 drops at url_dup
  //  3 repeats 1's text exactly (own URL)  -> drops at exact_dup
  //  4 is empty text                        -> drops at quality
  //  5 contains the benchmark trigram       -> drops at contaminated
  //  6,7 same source, budget fits only one  -> later-priority drops at budget
  private val longA = ("alpha beta gamma delta " * 6).trim
  private val longB = ("omega psi chi phi tau " * 6).trim
  private val docs = Seq(
    (1L, "http://a.com/x", longA, "s1"),
    (2L, "http://a.com/x?utm_source=z", "unused text variant", "s1"),
    (3L, "http://a.com/y", longA, "s2"),
    (4L, "http://a.com/z", "", "s3"),
    (5L, "http://a.com/w", "leaked bench secret words " + longB, "s4"),
    (6L, "http://a.com/u", longB, "s5"),
    (7L, "http://a.com/v", longB + " extra tail words", "s5")
  ).toDF("doc_id", "url", "text", "source")
  private val bench = Seq((100L, "leaked bench secret words here"))
    .toDF("doc_id", "text")

  private def disp = Curation.disposition(docs, bench,
    "url", "doc_id", "text", "source",
    minQuality = 0.3, ngramN = 3, minHits = 1, budgetPerSource = 30L)

  test("every document lands in exactly one stage") {
    val d = disp.collect()
    assert(d.length === 7)
    assert(d.map(_.getLong(0)).toSet === (1L to 7L).toSet)
  }

  test("each stage claims its designed casualty") {
    val m = disp.select("id", "drop_stage").as[(Long, String)].collect().toMap
    assert(m(2L) === "url_dup")
    assert(m(3L) === "exact_dup")
    assert(m(4L) === "quality")
    assert(m(5L) === "contaminated")
    assert(m(1L) === "kept")
    // 6 and 7 share source s5 with budget 30: md5 priority picks one
    assert(Set(m(6L), m(7L)) === Set("kept", "budget"))
  }

  test("funnel counts reconcile to the input total") {
    val f = Curation.funnel(disp)
      .select("stage_order", "drop_stage", "n_docs")
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(f.map(_._3).sum === 7L)
    assert(f.find(_._2 == "kept").get._3 === 2L)
  }

  test("bloom decontamination path yields identical dispositions") {
    val exact = disp.orderBy("id").collect().toSeq
    val bloom = Curation.disposition(docs, bench,
        "url", "doc_id", "text", "source",
        minQuality = 0.3, ngramN = 3, minHits = 1, budgetPerSource = 30L,
        bloomDecontam = true)
      .orderBy("id").collect().toSeq
    assert(bloom === exact,
      "the Bloom prefilter is a physical optimization — dispositions must not move")
  }

  test("disposition is partition-invariant") {
    def run(parts: Int) = Curation.disposition(
      docs.repartition(parts), bench, "url", "doc_id", "text", "source",
      0.3, 3, 1, 30L).orderBy("id").collect().toSeq
    assert(run(1) === run(5))
  }

  test("NULL text rows are attributed (quality), not silently vanished") {
    val dirty = Seq(
      (1L, "http://a.com/x", longA, "s1"),
      (2L, "http://a.com/y", null.asInstanceOf[String], "s1"),
      (3L, "http://a.com/z", null.asInstanceOf[String], "s2"),
      (4L, "http://a.com/w", longB, "s2")
    ).toDF("doc_id", "url", "text", "source")
    val d = Curation.disposition(dirty, bench, "url", "doc_id", "text", "source",
      0.3, 3, 1, 1000L).select("id", "drop_stage").as[(Long, String)].collect().toMap
    // the reconciliation invariant holds on dirty input: one row per doc
    assert(d.keySet === Set(1L, 2L, 3L, 4L))
    // NULL text has no content identity — not an exact_dup of the other
    // NULL row; it dies at the quality gate with an explicit disposition
    assert(d(2L) === "quality" && d(3L) === "quality")
    assert(d(1L) === "kept" && d(4L) === "kept")
  }

  test("null-canonical urls are never deduped away") {
    val weird = Seq(
      (1L, "not a url", "some words here one", "s1"),
      (2L, "not a url", "other words here two", "s1")
    ).toDF("doc_id", "url", "text", "source")
    val d = Curation.disposition(weird, bench, "url", "doc_id", "text", "source",
      0.0, 3, 1, 1000L).select("id", "drop_stage").as[(Long, String)].collect().toMap
    assert(d(1L) === "kept" && d(2L) === "kept")
  }

  test("decontamMatrix: columns equal the component detectors; fold is the union") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val (train, bench) = (d.filter(col("doc_id") < 300), d.filter(col("doc_id") >= 300))
    val (tv, bv) = (emb.filter(col("vec_id") < 300), emb.filter(col("vec_id") >= 300))
    val m = Curation.decontamMatrix(train, bench, tv, bv,
      "doc_id", "text", ngramN = 3, minHits = 5L).cache()

    // one row per train doc, no more no less
    assert(m.count() === train.count())
    assert(m.select("id").distinct().count() === train.count())

    // each column reproduces its own detector verbatim
    val exact = graft.text.Decontaminate
      .flagContaminated(train, bench, "doc_id", "text", 3, 5L)
      .select("id", "contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val fuzzy = graft.text.Decontaminate
      .flagNearContaminated(train, bench, "doc_id", "text", threshold = 0.9)
      .select("id").collect().map(_.getLong(0)).toSet
    val benchItems = bench.select(col("doc_id"),
      concat_ws(" ", slice(graft.text.TextAnalysis.tokens(col("text")), 1, 24)).as("text"))
    val chunked = graft.text.Decontaminate
      .flagNearContaminatedChunked(train, benchItems, "doc_id", "text",
        chunkSize = 24, stride = 12, threshold = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val sem = graft.similarity.SemanticDecontam
      .flagSemanticContaminated(tv, bv, tau = 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    m.collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1) === exact(id), s"exact column, doc $id")
      assert(r.getBoolean(2) === fuzzy.contains(id), s"fuzzy column, doc $id")
      assert(r.getBoolean(3) === chunked.contains(id), s"chunked column, doc $id")
      assert(r.getBoolean(4) === sem.contains(id), s"semantic column, doc $id")
      assert(r.getBoolean(5) === (r.getBoolean(1) || r.getBoolean(2) ||
        r.getBoolean(3) || r.getBoolean(4)))
    }
    // the matrix must exercise DISAGREEMENT — a family flagging a doc
    // the others miss is the artifact's reason to exist
    val rows = m.collect().map(r =>
      (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    assert(rows.exists { case (e, f, _, s) => s && !e && !f },
      "fixture must contain semantic-only (paraphrase-class) flags")
    assert(rows.exists { case (e, f, c, s) => !e && !f && !c && !s }, "and clean docs")

    // a train doc with NO embedding row can still be token-flagged but
    // never semantically (NULL-safe false)
    val m2 = Curation.decontamMatrix(train, bench,
      tv.filter(col("vec_id") < 10), bv, "doc_id", "text", ngramN = 3, minHits = 5L)
    assert(m2.filter(col("id") >= 10 && col("semantic")).count() === 0)
    assert(m2.count() === train.count())
  }
}
