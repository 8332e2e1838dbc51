package graft

import graft.ops.Fingerprint

class FingerprintSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L),
    (5L, "e", 50L), (6L, "f", 60L), (7L, "g", 70L), (8L, "h", 80L)
  ).toDF("k", "s", "v")

  private val cols = Seq("k", "s", "v")

  test("identical snapshots diff to zero buckets") {
    val d = Fingerprint.snapshotDiff(base, base, "k", cols, nBuckets = 4)
    assert(d.count() === 0L)
  }

  test("a single changed row surfaces exactly its bucket") {
    val mutated = base.withColumn("s",
      org.apache.spark.sql.functions.when($"k" === 5L,
        org.apache.spark.sql.functions.lit("CHANGED")).otherwise($"s"))
    val d = Fingerprint.snapshotDiff(base, mutated, "k", cols, nBuckets = 4)
      .collect()
    assert(d.length === 1)
    val r = d.head
    // same row count (update, not delete) but different xor fingerprint
    assert(r.getAs[Long]("n_rows_a") === r.getAs[Long]("n_rows_b"))
    assert(r.getAs[Long]("fp_a") !== r.getAs[Long]("fp_b"))
  }

  test("a deleted row changes count and fp; an emptied bucket still surfaces") {
    val d1 = Fingerprint.snapshotDiff(base, base.filter($"k" =!= 3L), "k",
      cols, nBuckets = 4).collect()
    assert(d1.length === 1)
    assert(d1.head.getAs[Long]("n_rows_a") ===
      d1.head.getAs[Long]("n_rows_b") + 1)
    // nBuckets = 1024 >> rows: k=3's bucket is a singleton, so deleting
    // it empties the bucket entirely — must still appear (full outer).
    val d2 = Fingerprint.snapshotDiff(base, base.filter($"k" =!= 3L), "k",
      cols, nBuckets = 1024).collect()
    assert(d2.length === 1)
    assert(d2.head.getAs[Long]("n_rows_b") === 0L)
    assert(d2.head.getAs[Long]("fp_b") === 0L)
  }

  test("fingerprints are partition- and order-invariant") {
    val a = Fingerprint.bucketFingerprints(base.repartition(7), "k", cols, 4)
      .collect().map(_.toSeq).toSet
    val b = Fingerprint.bucketFingerprints(
      base.orderBy($"k".desc).coalesce(1), "k", cols, 4)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("bucket counts sum to the table row count") {
    val fp = Fingerprint.bucketFingerprints(base, "k", cols, 4).collect()
    assert(fp.map(_.getAs[Long]("n_rows")).sum === 8L)
    assert(fp.forall(r => r.getAs[Long]("bucket") >= 0L))
  }
}
