package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Tables
import graft.streaming.EventStreams

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-stream").toString

  /** Run `body` with the RocksDB state store provider, restoring the
    * suite session's provider after — the production state backend
    * (changelog checkpointing, multi-TB restorable state), exercised on
    * every stateful-API family, not just transformWithState.
    */
  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming dedup on the RocksDB provider: same result, bounded state") {
    val dir = tmp()
    val base = Tables.readEvents(spark, "/root/testdata/sf0.001")
    base.unionAll(base.limit(300)).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    withRocksDb {
      val stream = spark.readStream.schema(schema).parquet(dir)
      val q = EventStreams.dedupStream(stream, Seq("event_id"))
        .writeStream.outputMode("append").format("memory")
        .queryName("dedup_rocks_out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(spark.table("dedup_rocks_out").count() === base.count())
    assert(spark.table("dedup_rocks_out").groupBy("event_id").count()
      .filter($"count" > 1).count() === 0)
  }

  test("streaming CDC latest-state on the RocksDB provider equals default-provider result") {
    val changes = Tables.readEvents(spark, "/root/testdata/sf0.001")
      .select(($"user_id" % 20).as("key"), $"event_id".as("seq"),
        element_at(array(lit("I"), lit("U"), lit("D")),
          ($"event_id" % 3).cast("int") + 1).as("op"),
        $"value".as("payload"))
    val dir = tmp()
    changes.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    withRocksDb {
      val stream = spark.readStream.schema(schema).parquet(dir)
        .as[EventStreams.Change]
      val q = EventStreams.cdcLatest(spark, stream)
        .writeStream.outputMode("update").format("memory")
        .queryName("cdc_rocks_out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // final state = per-key max-seq emission (seq = event_id, unique);
    // must equal the batch winner rule with deleted = (op = 'D')
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy($"seq".desc)
    val want = changes
      .withColumn("__rn", row_number().over(win)).filter($"__rn" === 1)
      .select($"key", $"seq", $"op", $"payload", ($"op" === "D").as("deleted"))
    val got = spark.table("cdc_rocks_out")
      .withColumn("__rn", row_number().over(win)).filter($"__rn" === 1)
      .select($"key", $"seq", $"op", $"payload", $"deleted")
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("windowed type stats: streaming result equals batch groupBy") {
    val batch = Tables.readEvents(spark, "/root/testdata/sf0.001")
    val dir = tmp()
    batch.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStreams.windowedTypeStats(stream)
      .writeStream.outputMode("append").format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("win_out")
      .select("win_start", "event_type", "n", "total_value")
    // watermark in append mode holds back the final windows of a finite
    // input, so assert equality on the windows that were emitted
    val batchRef = EventStreams.windowedTypeStats(batch)
      .select("win_start", "event_type", "n", "total_value")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batchRef).count() === 0,
      "every emitted window must match the batch computation")
  }

  test("rolling active sketch: stream equals batch; sketch tracks the exact count") {
    val batch = Tables.readEvents(spark, "/root/testdata/sf0.001")
    val dir = tmp()
    batch.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val q = EventStreams.rollingActiveSketch(
        spark.readStream.schema(schema).parquet(dir), windowDays = 3)
      .writeStream.outputMode("append").format("memory").queryName("wau_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("wau_out")
    val batchRef = EventStreams.rollingActiveSketch(batch, windowDays = 3)
    // append mode holds back unclosed windows on finite input — emitted
    // windows must match the batch run of the SAME code exactly (HLL
    // register merge is order-insensitive)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batchRef).count() === 0,
      "every emitted window must match the batch sketch")

    // and the sketch must track the exact batch answer within HLL error:
    // compare on trailing-window day = win_end - 1 day (the batch op keys
    // by report day, the sliding window by [start, end))
    val exact = graft.ops.RollingDistinct.activeKeys(batch, "ts", "user_id", 3)
      .select(col("day"), col("active"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val approx = batchRef
      .select(to_date(col("win_end") - expr("INTERVAL 1 DAY")).as("day"), col("active_approx"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val common = exact.keySet intersect approx.keySet
    assert(common.nonEmpty)
    common.foreach { d =>
      val (e, a) = (exact(d).toDouble, approx(d).toDouble)
      assert(math.abs(a - e) / e <= 0.15,
        s"day $d: sketch $a vs exact $e exceeds HLL tolerance")
    }
  }

  test("native session_window equals the batch gap rule (counts + starts)") {
    val ev = Tables.readEvents(spark, "/root/testdata/sf0.001").filter($"user_id" < 10)
    val viaSessionWindow = EventStreams.sessionWindowStats(ev)
      .select("user_id", "start_us", "n_events", "total_value")
    val viaBatchRule = graft.ops.Sessionize.sessionStats(
      ev, "user_id", "ts", 1800, "value", Seq($"event_id"))
      .select("user_id", "start_us", "n_events", "total_value")
    assert(viaSessionWindow.count() === viaBatchRule.count())
    assert(viaSessionWindow.exceptAll(viaBatchRule).count() === 0)
  }

  test("stream-stream attribution join: streaming result equals batch join") {
    val events = Tables.readEvents(spark, "/root/testdata/sf0.001")
    val vDir = tmp(); val pDir = tmp()
    events.filter($"event_type" === "view").write.mode("overwrite").parquet(vDir)
    events.filter($"event_type" === "purchase").write.mode("overwrite").parquet(pDir)
    val schema = spark.read.parquet(vDir).schema

    val q = EventStreams.attributionJoin(
        spark.readStream.schema(schema).parquet(vDir),
        spark.readStream.schema(schema).parquet(pDir))
      .writeStream.outputMode("append").format("memory").queryName("attr_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("attr_out")
      .select("view_id", "purchase_id", "purchase_value")
    // same operator over batch frames (withWatermark is a no-op there)
    val batchRef = EventStreams.attributionJoin(
        events.filter($"event_type" === "view"),
        events.filter($"event_type" === "purchase"))
      .select("view_id", "purchase_id", "purchase_value")
    assert(streamed.count() > 0, "fixture must produce attributed pairs")
    assert(streamed.count() === batchRef.count())
    assert(streamed.exceptAll(batchRef).count() === 0,
      "inner stream-stream join must emit exactly the batch pairs")
  }

  test("streaming dedup drops repeated keys within the watermark") {
    val dir = tmp()
    val base = Tables.readEvents(spark, "/root/testdata/sf0.001")
    base.unionAll(base.limit(200)).write.mode("overwrite").parquet(dir) // 200 dup rows
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStreams.dedupStream(stream, Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(spark.table("dedup_out").count() === base.count())
    assert(spark.table("dedup_out").groupBy("event_id").count()
      .filter($"count" > 1).count() === 0)
  }

  test("stateful sessionize: closed sessions match the batch gap rule") {
    val dir = tmp()
    Tables.readEvents(spark, "/root/testdata/sf0.001")
      .filter($"user_id" < 10)
      .select($"event_id", $"user_id", unix_micros($"ts".cast("timestamp")).as("tsUs"), $"value")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema).parquet(dir).as[EventStreams.Ev]
    val q = EventStreams.sessionize(spark, stream, gapSeconds = 1800)
      .writeStream.outputMode("append").format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("sess_out")
      .select($"user_id", $"start_us", $"end_us", $"n_events")

    // batch reference: the same gap rule via window functions; the stream's
    // final open session per user is unemitted (no timeout fired), so
    // compare after dropping each user's last batch session
    val batch = graft.ops.Sessionize.sessionStats(
      Tables.readEvents(spark, "/root/testdata/sf0.001").filter($"user_id" < 10),
      "user_id", "ts", 1800, "value", Seq($"event_id"))
    val lastPerUser = batch.groupBy("user_id").agg(max("session_id").as("session_id"))
    val batchClosed = batch.join(lastPerUser, Seq("user_id", "session_id"), "left_anti")
      .select($"user_id", $"start_us", $"end_us", $"n_events")

    assert(streamed.count() === batchClosed.count())
    assert(streamed.exceptAll(batchClosed).count() === 0)
  }

  test("transformWithState sessionize matches flatMapGroupsWithState + batch rule") {
    val dir = tmp()
    Tables.readEvents(spark, "/root/testdata/sf0.001")
      .filter($"user_id" < 10)
      .select($"event_id", $"user_id", unix_micros($"ts".cast("timestamp")).as("tsUs"), $"value")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    // transformWithState requires the RocksDB state store; scope it to
    // this query and restore whatever the suite session had.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema).parquet(dir).as[EventStreams.Ev]
      val q = EventStreams.sessionizeTws(spark, stream, gapSeconds = 1800)
        .writeStream.outputMode("append").format("memory").queryName("tws_out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

    val streamed = spark.table("tws_out")
      .select($"user_id", $"start_us", $"end_us", $"n_events")

    // same closed-session reference as the flatMapGroupsWithState test:
    // batch gap rule minus each user's final (still-open) session
    val batch = graft.ops.Sessionize.sessionStats(
      Tables.readEvents(spark, "/root/testdata/sf0.001").filter($"user_id" < 10),
      "user_id", "ts", 1800, "value", Seq($"event_id"))
    val lastPerUser = batch.groupBy("user_id").agg(max("session_id").as("session_id"))
    val batchClosed = batch.join(lastPerUser, Seq("user_id", "session_id"), "left_anti")
      .select($"user_id", $"start_us", $"end_us", $"n_events")

    assert(streamed.count() === batchClosed.count())
    assert(streamed.exceptAll(batchClosed).count() === 0)
  }

  test("text quality gate is streaming-safe: stream output equals batch") {
    // the whole text tier (tokens/quality/lang-id/redaction/fingerprints)
    // is stateless per-row expressions, so a streaming ingest can gate and
    // scrub documents with the identical code path as batch — assert it,
    // so a stateful construct sneaking into TextAnalysis fails here
    import graft.text.TextAnalysis
    def gate(df: org.apache.spark.sql.DataFrame) = df.select(
        col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.redactPii(col("text")).as("clean_text"),
        TextAnalysis.docFingerprint(col("text")).as("fp"))
      .filter(col("quality") > 0.3)

    val src = tmp() // stream sources must be directories
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = gate(spark.readStream.schema(schema).parquet(src))
      .writeStream.outputMode("append").format("memory").queryName("gate_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("gate_out")
    val batch = gate(spark.read.parquet(src))
    assert(streamed.count() === batch.count())
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("streaming CDC latest-state: batch winner rule survives micro-batch boundaries") {
    import EventStreams.Change
    val dir = tmp()
    // two files → two micro-batches under maxFilesPerTrigger=1
    Seq(Change(1L, 1L, "I", 10.0), Change(2L, 1L, "I", 20.0),
        Change(3L, 1L, "I", 30.0))
      .toDF().coalesce(1).write.parquet(s"$dir/f1")
    Seq(Change(1L, 2L, "U", 11.0), Change(2L, 2L, "D", 0.0),
        Change(4L, 1L, "I", 40.0),
        Change(3L, 0L, "U", 99.0)) // stale: must lose to batch-1 state
      .toDF().coalesce(1).write.parquet(s"$dir/f2")
    val schema = spark.read.option("recursiveFileLookup", "true").parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir).as[Change]
    val q = EventStreams.cdcLatest(spark, stream)
      .writeStream.outputMode("update").format("memory").queryName("cdc_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // every emission per key carries the winner-so-far; the max-seq
    // emission is the final state (winner is monotone in (seq, op))
    val fin = spark.table("cdc_out")
      .orderBy(col("key"), col("seq").desc, col("op").desc)
      .dropDuplicates("key")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(fin(1L) === ((2L, "U", 11.0, false)))
    assert(fin(2L) === ((2L, "D", 0.0, true)))  // tombstone
    assert(fin(3L) === ((1L, "I", 30.0, false))) // stale update lost
    assert(fin(4L) === ((1L, "I", 40.0, false)))
  }

  test("stream-static enrichment against the SCD2 current slice equals batch") {
    // the integration story: Merge.scd2Apply maintains the dimension,
    // its CURRENT slice (valid_to IS NULL) enriches a live event stream
    // as a plain stream-static join — identical code path to batch
    import java.sql.Date
    val dim = Seq(
      (1L, "bronze", Date.valueOf("2020-01-01"), Option(Date.valueOf("2021-01-01"))),
      (1L, "platinum", Date.valueOf("2021-01-01"), None: Option[Date]),
      (2L, "silver", Date.valueOf("2020-01-01"), None: Option[Date])
    ).toDF("user_id", "tier", "valid_from", "valid_to")
    val changes = Seq((2L, "gold", Date.valueOf("2022-06-01")))
      .toDF("user_id", "tier", "eff")
    val maintained = graft.ops.Merge.scd2Apply(dim, changes, Seq("user_id"),
      "valid_from", "valid_to", "eff")
    val current = maintained.filter(col("valid_to").isNull)
      .select("user_id", "tier")

    val src = tmp()
    Tables.readEvents(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") <= 2).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    def enrich(ev: org.apache.spark.sql.DataFrame) =
      ev.join(current, Seq("user_id")).select(col("event_id"), col("tier"))
    val q = enrich(spark.readStream.schema(schema).parquet(src))
      .writeStream.outputMode("append").format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("enrich_out")
    val batch = enrich(spark.read.parquet(src))
    assert(streamed.count() === batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    // and the maintained slice is what enriched: user 2 reads gold
    assert(streamed.filter(col("tier") === "gold").count() ===
      spark.read.parquet(src).filter(col("user_id") === 2L).count())
  }
}
