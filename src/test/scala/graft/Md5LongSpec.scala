package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Md5Long

class Md5LongSpec extends SparkTestBase {
  import spark.implicits._

  /** The hex composite the fused expressions replaced — kept here as the
    * semantic reference both must match bit-for-bit.
    */
  private def composite60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(to_binary(c, lit("utf-8"))), 1, 15), 16, 10).cast(LongType)

  private def composite64(c: org.apache.spark.sql.Column) = {
    val m = md5(to_binary(c, lit("utf-8")))
    val h1 = conv(substring(m, 1, 15), 16, 10).cast(LongType)
    val h2 = conv(substring(m, 16, 1), 16, 10).cast(LongType)
    // h1 | h2 << 60 — disjoint bits, so + is bitwise-or.  shiftleft on
    // h2 ∈ 0..15 can set bit 63 (negative long), same as the expression.
    h1 + shiftleft(h2, 60)
  }

  test("hash60 == hex composite bit-for-bit over corpus tokens") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .limit(5000)
    val mismatches = toks.select(
        Md5Long.md5Long60(col("t")).as("fast"), composite60(col("t")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches === 0)
  }

  test("hash64 == h1 | h2<<60 composite bit-for-bit, including bit 63") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .limit(5000)
    val rows = toks.select(
        Md5Long.md5Long64(col("t")).as("fast"), composite64(col("t")).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // 16th hex char >= 8 appears in ~half of hashes — assert we actually
    // exercised the negative (bit 63) half
    assert(rows.exists(_.getLong(0) < 0))
    assert(rows.exists(_.getLong(0) >= 0))
  }

  test("known vectors, empty string, unicode, null propagation") {
    val df = Seq(Some(""), Some("abc"), Some("héllo wörld"), None)
      .toDF("s")
    val rows = df.select(
        Md5Long.md5Long60($"s").as("fast"), composite60($"s").as("ref"),
        Md5Long.md5Long64($"s").as("fast64"), composite64($"s").as("ref64"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0) && r.isNullAt(2) && r.isNullAt(3))
      else {
        assert(r.getLong(0) === r.getLong(1))
        assert(r.getLong(2) === r.getLong(3))
      }
    }
    // md5("") = d41d8cd98f00b204..., first 15 hex chars as a long
    assert(rows(0).getLong(0) === java.lang.Long.parseLong("d41d8cd98f00b20", 16))
  }

  test("range: hash60 is non-negative and < 2^60") {
    val toks = (0 until 2000).map(i => s"tok$i").toDF("t")
    val agg = toks.select(Md5Long.md5Long60($"t").as("h"))
      .agg(min("h").as("lo"), max("h").as("hi")).head()
    assert(agg.getLong(0) >= 0L)
    assert(agg.getLong(1) < (1L << 60))
  }

  test("interpreted eval matches codegen (filter pushes into non-codegen paths)") {
    // eval() path: use the expression inside a literal-folding context
    val lit60 = spark.sql("SELECT md5_long('abc') AS h").head().getLong(0)
    val df60 = Seq("abc").toDF("s").select(Md5Long.md5Long60($"s")).head().getLong(0)
    assert(lit60 === df60)
    val lit64 = spark.sql("SELECT md5_long64('abc') AS h").head().getLong(0)
    val df64 = Seq("abc").toDF("s").select(Md5Long.md5Long64($"s")).head().getLong(0)
    assert(lit64 === df64)
  }

  test("DuckDB-oracle dialect parity: matches md5LongSql's documented form") {
    // the oracle replays ('0x' || substring(md5(x), 1, 15))::BIGINT; the
    // Spark-side equivalent of that exact string pipeline is composite60,
    // already asserted equal to the fused path above. Here: a pinned
    // cross-engine vector computed once in DuckDB by hand.
    //   duckdb: SELECT ('0x' || substring(md5('graft'), 1, 15))::BIGINT
    //           = 466617675313949775
    assert(Seq("graft").toDF("s").select(Md5Long.md5Long60($"s"))
      .head().getLong(0) === 466617675313949775L)
  }
}
