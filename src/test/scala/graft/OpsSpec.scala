package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleansing, Dedup, Sessionize, Windows}

class OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("sanitizers: dirty strings → typed, garbage → NULL (not ANSI error)") {
    val df = Seq("5,123", "0,5", "garbage", null)
      .toDF("s").select(Cleansing.commaDecimalToDouble($"s").as("d"))
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
      === Seq(5.123, 0.5, null, null))
    val q = Seq("1.234.567", "-1.000", "12", "x.y", null)
      .toDF("s").select(Cleansing.formattedToLong($"s").as("l"))
    assert(q.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
      === Seq(1234567L, -1000L, 12L, null, null))
  }

  test("toDatePattern: valid dates parse, garbage degrades to NULL under ANSI") {
    val df = Seq("2024-01-03", "not-a-date", "2024-13-99", null)
      .toDF("s").select(Cleansing.toDatePattern($"s").as("d"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getDate(0).toString)
    assert(got.toSeq === Seq("2024-01-03", null, null, null))
  }

  test("rolling median exact: odd frames true median, even frames lower-middle") {
    val df = (1 to 6).map(i => ("k", i, i.toDouble)).toDF("k", "i", "v")
    val w = Windows.rolling(Seq($"k"), Seq($"i"), 4)
    val med = df.select($"i", Windows.rollingMedianExact($"v", w).as("m"))
      .orderBy("i").collect().map(_.getDouble(1)).toSeq
    // frames: [1] [1,2] [1,2,3] [1..4] [2..5] [3..6]
    assert(med === Seq(1.0, 1.0, 2.0, 2.0, 3.0, 4.0))
  }

  test("rolling stats bundle shares one window: stddev NULL on 1-row frame") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 14.0)).toDF("k", "i", "v")
    val out = Windows.withRollingStats(df, "v", Seq("k"), Seq($"i"), 7, "v7")
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("std_v7")))
    assert(math.abs(out(1).getAs[Double]("std_v7") - math.sqrt(8.0)) < 1e-12)
    assert(out(1).getAs[Double]("mean_v7") === 12.0)
  }

  test("keepFirst is deterministic under explicit ordering") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "c", 30)).toDF("k", "o", "v")
    val kept = Dedup.keepFirst(df, Seq("k"), Seq($"o")).orderBy("k").collect()
    assert(kept.map(_.getInt(2)).toSeq === Seq(10, 30))
  }

  test("pruneAllNullColumns keeps essential all-null columns") {
    val df = Seq((1, null: String, null: String), (2, null, null))
      .toDF("id", "dead", "keepme")
    val pruned = Cleansing.pruneAllNullColumns(df, essential = Set("keepme"))
    assert(pruned.columns.toSeq === Seq("id", "keepme"))
  }

  test("sessionize: gap splits sessions, stats correct") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    val df = Seq(
      (1L, ts(0), 1.0, 1L), (1L, ts(10), 2.0, 2L), // session 1
      (1L, ts(50), 3.0, 3L), // gap 40min > 30 → session 2
      (2L, ts(0), 5.0, 4L) // other user
    ).toDF("user_id", "ts", "value", "event_id")
    val sess = Sessionize.sessionStats(df, "user_id", "ts", 1800, "value", Seq($"event_id"))
      .orderBy("user_id", "session_id").collect()
    assert(sess.length === 3)
    assert(sess(0).getAs[Long]("n_events") === 2)
    assert(sess(0).getAs[Double]("total_value") === 3.0)
    assert(sess(1).getAs[Long]("n_events") === 1)
    assert(sess(2).getAs[Long]("user_id") === 2L)
  }
}
