package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ops.Merge

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // ---- applyChanges -----------------------------------------------------

  private lazy val snapshot = Seq(
    (1L, "a", 10.0),
    (2L, "b", 20.0),
    (3L, "c", 30.0),
    (4L, "d", 40.0)
  ).toDF("k", "name", "amt")

  private lazy val changes = Seq(
    (2L, "b2", 21.0, "U", 100L),  // superseded by seq 101
    (2L, "b3", 22.0, "U", 101L),  // winner for k=2
    (3L, "c", 30.0, "D", 100L),   // delete k=3
    (5L, "e", 50.0, "I", 100L),   // insert new key
    (6L, "f", 60.0, "I", 100L),   // insert…
    (6L, "f", 60.0, "D", 101L)    // …then delete: net absent
  ).toDF("k", "name", "amt", "op", "seq")

  private lazy val merged =
    Merge.applyChanges(snapshot, changes, Seq("k"), "seq", "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

  test("latest change per key wins; D removes; untouched keys pass through") {
    assert(merged === Array(
      (1L, "a", 10.0),   // untouched
      (2L, "b3", 22.0),  // seq-101 update won
      (4L, "d", 40.0),   // untouched
      (5L, "e", 50.0)))  // inserted; 3 deleted; 6 insert-then-deleted
  }

  test("same-seq tie breaks U over D deterministically") {
    val tie = Seq((1L, "a2", 11.0, "U", 7L), (1L, "a3", 12.0, "D", 7L))
      .toDF("k", "name", "amt", "op", "seq")
    val out = Merge.applyChanges(snapshot, tie, Seq("k"), "seq", "op")
      .filter($"k" === 1L).collect()
    assert(out.length === 1 && out(0).getString(1) === "a2")
  }

  test("empty change batch is the identity") {
    val out = Merge.applyChanges(snapshot, changes.limit(0), Seq("k"), "seq", "op")
    assert(out.orderBy("k").collect().toSeq ===
      snapshot.orderBy("k").collect().toSeq)
  }

  test("delete of an absent key is a no-op, not an error") {
    val tomb = Seq((99L, "zz", 0.0, "D", 5L)).toDF("k", "name", "amt", "op", "seq")
    val out = Merge.applyChanges(snapshot, tomb, Seq("k"), "seq", "op")
    assert(out.orderBy("k").collect().toSeq ===
      snapshot.orderBy("k").collect().toSeq)
  }

  test("scd2Apply with an empty change batch is the identity") {
    val out = Merge.scd2Apply(dim, dimChanges.limit(0), Seq("k"),
      "valid_from", "valid_to", "eff")
    assert(out.orderBy("k", "valid_from").collect().toSeq ===
      dim.orderBy("k", "valid_from").collect().toSeq)
  }

  // ---- scd2Apply --------------------------------------------------------

  private lazy val dim = Seq(
    // k=1: one closed version + current
    (1L, "alice", 0.0, d("2019-01-01"), Option(d("2020-01-01"))),
    (1L, "alice", 100.0, d("2020-01-01"), None: Option[Date]),
    // k=2: current only
    (2L, "bob", 200.0, d("2020-01-01"), None: Option[Date])
  ).toDF("k", "name", "bal", "valid_from", "valid_to")

  private lazy val dimChanges = Seq(
    (1L, "alice", 150.0, d("2021-06-01")),  // existing key: close + append
    (9L, "zoe", 900.0, d("2021-06-01"))     // brand-new key: append only
  ).toDF("k", "name", "bal", "eff")

  private lazy val applied =
    Merge.scd2Apply(dim, dimChanges, Seq("k"), "valid_from", "valid_to", "eff")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2),
        r.getDate(3).toString, Option(r.getDate(4)).map(_.toString)))

  test("scd2Apply closes current rows of changed keys and appends versions") {
    assert(applied === Array(
      (1L, 0.0, "2019-01-01", Some("2020-01-01")),   // history verbatim
      (1L, 100.0, "2020-01-01", Some("2021-06-01")), // closed out
      (1L, 150.0, "2021-06-01", None),               // new current
      (2L, 200.0, "2020-01-01", None),               // unchanged current
      (9L, 900.0, "2021-06-01", None)))              // new key
  }

  test("scd2Apply preserves exactly one current row per changed key") {
    val out = Merge.scd2Apply(dim, dimChanges, Seq("k"), "valid_from", "valid_to", "eff")
    val perKey = out.filter(col("valid_to").isNull)
      .groupBy("k").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(perKey === Map(1L -> 1L, 2L -> 1L, 9L -> 1L))
  }

  // ---- upsertAggregates -------------------------------------------------

  private lazy val rawOld = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)).toDF("g", "v")
  private lazy val rawNew = Seq(("a", 4.0), ("b", 20.0), ("c", 100.0)).toDF("g", "v")
  private lazy val rawAll = rawOld.unionByName(rawNew)

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(count(lit(1)).as("n"), sum($"v").as("v"))
      .select("g", "n", "v")

  test("upsertAggregates: accumulator + batch equals the full aggregate") {
    val merged = Merge.upsertAggregates(aggOf(rawOld), rawNew,
      Seq("g"), Seq("v"), "n")
    assert(merged.orderBy("g").collect().toSeq ===
      aggOf(rawAll).orderBy("g").collect().toSeq)
  }

  test("upsertAggregates in two installments equals one (associative)") {
    val empty = aggOf(rawAll.limit(0))
    val oneShot = Merge.upsertAggregates(empty, rawAll, Seq("g"), Seq("v"), "n")
    val twoShot = Merge.upsertAggregates(
      Merge.upsertAggregates(empty, rawOld, Seq("g"), Seq("v"), "n"),
      rawNew, Seq("g"), Seq("v"), "n")
    assert(twoShot.orderBy("g").collect().toSeq ===
      oneShot.orderBy("g").collect().toSeq)
  }
}
