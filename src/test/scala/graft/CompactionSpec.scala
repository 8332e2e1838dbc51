package graft

import graft.ops.Compaction

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def plan(files: Seq[(String, Long, Long)], target: Long) =
    Compaction.planBins(files.toDF("part", "file_id", "bytes"),
        "part", "file_id", "bytes", target)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

  test("next-fit bins: cumulative-before divided by target") {
    // part a, target 100: sizes 60,60,60,60 -> cum-before 0,60,120,180
    // -> bins 0,0,1,1.
    val out = plan(Seq(
      ("a", 1L, 60L), ("a", 2L, 60L), ("a", 3L, 60L), ("a", 4L, 60L)),
      target = 100L)
    assert(out(("a", 0L)) === ((2L, 120L)))
    assert(out(("a", 1L)) === ((2L, 120L)))
  }

  test("a file larger than the target gets its own bin boundary") {
    // sizes 250,10: cum-before 0,250 -> bins 0,2 (bin 1 skipped — the
    // oversized file consumed its span; no split, no merge).
    val out = plan(Seq(("a", 1L, 250L), ("a", 2L, 10L)), target = 100L)
    assert(out(("a", 0L)) === ((1L, 250L)))
    assert(out(("a", 2L)) === ((1L, 10L)))
  }

  test("partitions plan independently: running sums restart per part") {
    // If b's sum continued from a's, b's files would land in bins 1-2;
    // instead each partition restarts at cum-before 0 -> both in bin 0.
    val out = plan(Seq(
      ("a", 1L, 90L), ("a", 2L, 90L),
      ("b", 1L, 90L), ("b", 2L, 90L)), target = 100L)
    assert(out(("a", 0L)) === ((2L, 180L)))
    assert(out(("b", 0L)) === ((2L, 180L)))
    assert(out.size === 2)
  }

  test("compactParquetDir: multi-file bins merge, singletons stay, rows survive") {
    val dir = java.nio.file.Files.createTempDirectory("compact_exec").resolve("t").toString
    // 6 single-row files, appended one at a time (the streaming-ingest shape)
    (1 to 6).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    assert(before.length === 6)
    // huge target -> all files land in one bin -> one output file
    val (nb, na) = Compaction.compactParquetDir(spark, dir, targetBytes = 1L << 30)
    assert(nb === 6 && na === 1, s"$nb -> $na")
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    assert(after === before)
    // second pass: single file, nothing to do
    assert(Compaction.compactParquetDir(spark, dir, targetBytes = 1L << 30) === ((1, 1)))
  }

  test("compactParquetDir: a tiny target leaves every file in its own bin (no-op)") {
    val dir = java.nio.file.Files.createTempDirectory("compact_noop").resolve("t").toString
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    // target 1 byte: every file's own cumulative span -> all singleton bins
    assert(Compaction.compactParquetDir(spark, dir, targetBytes = 1L) === ((3, 3)))
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("plan totals preserve listing totals") {
    val files = (1L to 50L).map(i => ("p" + (i % 3), i, 10L + i))
    val out = plan(files, target = 200L)
    assert(out.values.map(_._2).sum === files.map(_._3).sum)
    assert(out.values.map(_._1).sum === 50L)
  }
}
