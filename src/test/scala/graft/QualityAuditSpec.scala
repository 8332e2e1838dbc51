package graft

import org.apache.spark.sql.functions._

import graft.ops.{QualityAudit, Sampling}

class QualityAuditSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1), Some("a"), Some(1.5)),
    (Some(2), Some("a"), None),
    (Some(2), None, Some(2.5)),
    (None, Some("b"), Some(2.5))
  ).toDF("k", "s", "v")

  test("exact audit: counts, distincts, completeness per column") {
    val out = QualityAudit.audit(df, Seq("k", "s", "v"), exact = true)
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out === Array(
      ("k", 4L, 3L, 2L, 0.75),
      ("s", 4L, 3L, 2L, 0.75),
      ("v", 4L, 3L, 2L, 0.75)))
  }

  test("approx audit agrees on small-cardinality columns") {
    val out = QualityAudit.audit(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL is exact at these cardinalities
    assert(out === Map("k" -> 2L, "s" -> 2L))
  }

  test("empty table reports zero rows and NULL completeness") {
    val out = QualityAudit.audit(df.limit(0), Seq("k"), exact = true).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 0L && out(0).getLong(2) === 0L)
    assert(out(0).isNullAt(4))
  }

  test("one aggregation pass: a single final Aggregate pair, no join") {
    val p = QualityAudit.audit(df, Seq("k", "s", "v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"audit must not join:\n$p")
  }

  // ---- epochOrder -------------------------------------------------------

  private lazy val ids = (1L to 100L).toDF("doc_id")

  test("epochOrder emits every id once per epoch") {
    val out = Sampling.epochOrder(ids, "doc_id", 3)
    assert(out.count() === 300L)
    val perEpoch = out.groupBy("epoch").agg(countDistinct("id").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perEpoch === Map(1 -> 100L, 2 -> 100L, 3 -> 100L))
  }

  test("epochs are differently ordered and deterministic") {
    val out = Sampling.epochOrder(ids, "doc_id", 2)
    val e1 = out.filter($"epoch" === 1).orderBy("ord").select("id")
      .collect().map(_.getLong(0)).toSeq
    val e2 = out.filter($"epoch" === 2).orderBy("ord").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(e1 !== e2)            // independent permutations
    assert(e1.sorted === e2.sorted)
    val again = Sampling.epochOrder(ids, "doc_id", 2)
      .filter($"epoch" === 1).orderBy("ord").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(again === e1)         // no RNG: stable run-over-run
  }
}
