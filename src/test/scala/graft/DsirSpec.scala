package graft

import org.apache.spark.sql.functions._

import graft.text.Dsir

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // target docs speak "gold"; raw-only docs speak "junk"; both share "the"
  private lazy val docs = Seq(
    (1L, "en", "gold gold the shiny gold"),
    (2L, "en", "gold the gold"),
    (3L, "xx", "junk junk the junk junk"),
    (4L, "xx", "junk the junk"),
    (5L, "xx", "gold the junk")
  ).toDF("doc_id", "lang", "text")

  test("target-vocabulary docs outweigh raw-only docs") {
    // absolute signs are not meaningful on a 19-token corpus (the Laplace
    // mass B dominates n, pulling every log-ratio toward a common
    // constant) — DSIR resampling only consumes the ORDERING, so that is
    // what the test pins: pure-gold > mixed > pure-junk
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
        targetPred = col("lang") === "en", buckets = 1024)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("weight_micro")).toMap
    assert(math.min(w(1L), w(2L)) > w(5L),
      s"gold docs must outrank the mixed doc: $w")
    assert(w(5L) > math.max(w(3L), w(4L)),
      s"mixed doc must outrank pure-junk docs: $w")
  }

  test("weights replay the Laplace log-ratio formula exactly (micro-quantized)") {
    val b = 64
    // independent replication: bucket every token with the same md5
    // family, then do the counting + formula in driver-side Scala
    val toks = docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"),
        (col("lang") === "en").as("is_t"))
      .withColumn("bk", graft.dedup.NearDup.md5Long(col("tok")) % lit(b.toLong))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bk"), r.getAs[Boolean]("is_t")))
    val cR = toks.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val cT = toks.filter(_._3).groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val nR = toks.size.toLong
    val nT = toks.count(_._3).toLong
    def lrMicro(bk: Long): Long = {
      val num = (cT.getOrElse(bk, 0L) + 1).toDouble * (nR + b).toDouble
      val den = (cR(bk) + 1).toDouble * (nT + b).toDouble
      math.rint(math.log(num / den) * 1e6).toLong
    }
    val expected = toks.groupBy(_._1).map { case (id, v) =>
      id -> (v.size.toLong, v.map(t => lrMicro(t._2)).sum)
    }
    val got = Dsir.importanceWeights(docs, "doc_id", "text",
        targetPred = col("lang") === "en", buckets = b)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_micro"))).toMap
    assert(got === expected)
  }

  test("partition-invariant: weights identical under repartition") {
    val base = Dsir.importanceWeights(docs, "doc_id", "text",
      targetPred = col("lang") === "en", buckets = 256).orderBy("id").collect()
    val shuffled = Dsir.importanceWeights(docs.repartition(7), "doc_id", "text",
      targetPred = col("lang") === "en", buckets = 256).orderBy("id").collect()
    assert(base.toSeq === shuffled.toSeq)
  }

  test("empty target subset: weights defined (uniform negative prior), no NaN/null") {
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
        targetPred = lit(false), buckets = 128)
      .collect()
    assert(w.length === 5)
    w.foreach(r => assert(!r.isNullAt(2)))
  }

  test("selectTop keeps the highest-weight docs with deterministic ties") {
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      targetPred = col("lang") === "en", buckets = 1024)
    val top = Dsir.selectTop(w, keep = 2).collect().map(_.getAs[Long]("id")).toSeq
    assert(top.toSet === Set(1L, 2L), s"the two pure-gold docs win: $top")
  }

  test("ratio table broadcasts; per-doc sum partial-aggregates") {
    val p = Dsir.importanceWeights(docs, "doc_id", "text",
      targetPred = col("lang") === "en", buckets = 256)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the B-bounded ratio table must broadcast into the token stream:\n$p")
  }
}
