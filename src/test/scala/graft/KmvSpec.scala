package graft

import org.apache.spark.sql.functions._

import graft.ops.Kmv

class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val events = graft.ops.Tables
    .readEvents(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("event_type"), col("user_id"))

  test("bottomK keeps exactly the k smallest distinct hashes (vs one-window reference)") {
    val got = Kmv.bottomK(events, Seq("event_type"), "user_id", k = 5)
      .orderBy("event_type", "rnk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3)))
    // reference: all distinct (key, h, v) sorted driver-side
    val all = events.select(col("event_type"), col("user_id").cast("string").as("v"))
      .distinct()
      .withColumn("h", graft.dedup.NearDup.md5Long(col("v")))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(1)))
    val expect = all.groupBy(_._1).toSeq.flatMap { case (k0, rows) =>
      rows.sortBy(r => (r._2, r._3)).take(5).zipWithIndex
        .map { case ((kk, h, v), i) => (kk, i + 1, h, v) }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq === expect)
  }

  test("fanout does not change the sketch") {
    val a = Kmv.bottomK(events, Seq("event_type"), "user_id", k = 7, fanout = 1)
      .orderBy("event_type", "rnk").collect().toSeq
    val b = Kmv.bottomK(events, Seq("event_type"), "user_id", k = 7, fanout = 64)
      .orderBy("event_type", "rnk").collect().toSeq
    assert(a === b)
    // and partitioning of the input doesn't either
    val c = Kmv.bottomK(events.repartition(13), Seq("event_type"), "user_id", k = 7)
      .orderBy("event_type", "rnk").collect().toSeq
    assert(a === c)
  }

  test("exact branch: n_seen < k pins the true distinct count") {
    val ndv = events.select("user_id").distinct().count()
    val est = Kmv.distinctSketch(events, Seq.empty, "user_id", k = (ndv + 10).toInt)
      .collect().head
    assert(est.getAs[Long]("n_seen") === ndv)
    assert(est.getAs[Long]("est_micro") === ndv * 1000000L)
  }

  test("estimator branch: within 3/sqrt(k-2) of the truth at k << ndv") {
    val df = (1 to 5000).map(i => s"val_$i").toDF("v")
    val k = 128
    val est = Kmv.distinctSketch(df, Seq.empty, "v", k = k).collect().head
    assert(est.getAs[Long]("n_seen") === k.toLong)
    val rel = est.getAs[Long]("est_micro").toDouble / 1e6 / 5000.0
    val tol = 3.0 / math.sqrt(k - 2.0)
    assert(math.abs(rel - 1.0) < tol, s"relative estimate $rel outside 1±$tol")
  }

  test("merge algebra: bottom-k of segment bottom-ks ≡ bottom-k of the union") {
    val segA = Kmv.bottomK(events.filter(col("event_id") % 2 === 0),
      Seq("event_type"), "user_id", k = 9)
    val segB = Kmv.bottomK(events.filter(col("event_id") % 2 =!= 0),
      Seq("event_type"), "user_id", k = 9)
    val merged = Kmv.mergeBottomK(segA.unionByName(segB), Seq("event_type"), k = 9)
      .orderBy("event_type", "rnk").collect().toSeq
    val whole = Kmv.bottomK(events, Seq("event_type"), "user_id", k = 9)
      .orderBy("event_type", "rnk").collect().toSeq
    assert(merged === whole)
  }

  test("segments: disk round trip, retry idempotence, sample read") {
    val seg = java.nio.file.Files.createTempDirectory("kmv_seg").resolve("seg").toString
    Kmv.writeSegments(events.filter(col("event_id") % 2 === 0),
      Seq("event_type"), "user_id", k = 16, seg, batchId = Some(0L))
    Kmv.writeSegments(events.filter(col("event_id") % 2 =!= 0),
      Seq("event_type"), "user_id", k = 16, seg, batchId = Some(1L))
    val once = Kmv.estimateFromSegments(spark, seg, Seq("event_type"), k = 16)
      .orderBy("event_type").collect().toSeq
    // replayed micro-batch: dynamic overwrite of batch_id=1, not a double-append
    Kmv.writeSegments(events.filter(col("event_id") % 2 =!= 0),
      Seq("event_type"), "user_id", k = 16, seg, batchId = Some(1L))
    val twice = Kmv.estimateFromSegments(spark, seg, Seq("event_type"), k = 16)
      .orderBy("event_type").collect().toSeq
    assert(once === twice)
    val oneShot = Kmv.distinctSketch(events, Seq("event_type"), "user_id", k = 16)
      .orderBy("event_type").collect().toSeq
    assert(once === oneShot)
    // the sample read path returns k rows per key, rank-contiguous
    val sample = Kmv.sampleFromSegments(spark, seg, Seq("event_type"), k = 16)
    val perKey = sample.groupBy("event_type").agg(
      count(lit(1)).as("n"), max("rnk").as("mx"), min("rnk").as("mn"))
      .collect()
    perKey.foreach { r =>
      assert(r.getAs[Long]("n") === r.getAs[Int]("mx").toLong)
      assert(r.getAs[Int]("mn") === 1)
    }
  }

  test("estimator accuracy sweep: within 3/sqrt(k-2) across cardinalities") {
    val k = 128
    val tol = 3.0 / math.sqrt(k - 2.0)
    Seq(500, 5000, 50000).foreach { ndv =>
      val df = (1 to ndv).map(i => s"u${ndv}_$i").toDF("v")
      val est = Kmv.distinctSketch(df, Seq.empty, "v", k = k).collect().head
      val rel = est.getAs[Long]("est_micro").toDouble / 1e6 / ndv.toDouble
      assert(math.abs(rel - 1.0) < tol, s"ndv=$ndv relative estimate $rel outside 1±$tol")
    }
  }

  test("empty input: bottomK and the estimate are empty, not an error") {
    val empty = events.filter(col("event_id") < -1)
    assert(Kmv.bottomK(empty, Seq("event_type"), "user_id", k = 8).count() === 0L)
    assert(Kmv.distinctSketch(empty, Seq("event_type"), "user_id", k = 8).count() === 0L)
  }

  test("NULL values are dropped, not hashed") {
    val df = Seq(Some("a"), None, Some("b"), Some("a")).toDF("v")
    val bk = Kmv.bottomK(df, Seq.empty, "v", k = 10).collect()
    assert(bk.map(_.getString(2)).sorted.toSeq === Seq("a", "b"))
  }

  test("non-injective string casts collapse to ONE sketch row per string image") {
    // distinct raw arrays with the same string image: ["a", "b"] and
    // ["a, b"] both cast to "[a, b]" — the typed dedup keeps both, so
    // without the string-image re-dedup the sketch would carry duplicate
    // (h, v) rows, double-count n_seen, and disagree with mergeBottomK's
    // (h, v) identity
    val df = Seq(Seq("a", "b"), Seq("a, b"), Seq("c")).toDF("v")
    val images = df.select(col("v").cast("string")).distinct().count()
    assert(images === 2L) // the collision is real
    val bk = Kmv.bottomK(df, Seq.empty, "v", k = 10)
    // identity contract: one row per distinct STRING image, rnk gapless
    assert(bk.count() === images)
    assert(Kmv.distinctSketch(df, Seq.empty, "v", k = 10)
      .select("n_seen").as[Long].head() === images)
    val ranks = bk.select("rnk").as[Int].collect().sorted
    assert(ranks.toSeq === (1 to images.toInt))
  }
}
