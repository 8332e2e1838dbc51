package graft

import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, VectorOps}

class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  test("codegen dot == interpreted HOF dot on double arrays") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, -1.5), Array(2.0, 4.0))).toDF("a", "b")
    val rows = df.select(
      DotProduct.dot($"a", $"b").as("fast"),
      VectorOps.dotHof($"a", $"b").as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(rows.head.getDouble(0) === 32.0)
  }

  test("float arrays widen per element, matching cast-then-multiply") {
    val df = Seq((Array(1.5f, 2.5f), Array(2.0f, 4.0f))).toDF("a", "b")
    val r = df.select(
      DotProduct.dot($"a", $"b"),
      VectorOps.dotHof(VectorOps.toDoubles($"a"), VectorOps.toDoubles($"b"))).head()
    assert(r.getDouble(0) === r.getDouble(1))
    assert(r.getDouble(0) === 13.0)
  }

  test("real embeddings: fast path equals interpreted path bit-for-bit") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val rows = a.crossJoin(b).select(
      DotProduct.dot(col("ea"), col("eb")).as("fast"),
      VectorOps.dotHof(VectorOps.toDoubles(col("ea")), VectorOps.toDoubles(col("eb"))).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("null array propagates null; SQL registration via GraftExtensions") {
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]])).toDF("a", "b")
    assert(df.select(DotProduct.dot($"a", $"b")).head().isNullAt(0))

    // function registry injection (same builder used by extensions)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      exprs => graft.functions.DotProduct(exprs.head, exprs(1)),
      "built-in")
    val r = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) === 11.0)
  }

  test("GraftExtensions registers vec_dot / minhash_sig / ngrams for SQL users") {
    // the shared test session is built withExtensions(GraftExtensions) —
    // these must resolve without any temp-function plumbing
    assert(spark.sql("SELECT vec_dot(array(1.0d), array(5.0d)) AS d")
      .head().getDouble(0) === 5.0)
    val g = spark.sql("SELECT ngrams(array('a','b','c'), 2) AS g")
      .head().getSeq[String](0)
    assert(g === Seq("a b", "b c"))
    val sig = spark.sql("SELECT minhash_sig(array('a b c'), 4) AS s")
      .head().getSeq[Long](0)
    assert(sig.length === 4)
    // non-literal arity knob fails with the named error, not a cast blowup
    val err = intercept[Exception] {
      spark.sql("SELECT ngrams(array('a'), CAST(rand()*3 AS INT))").collect()
    }
    assert(err.getMessage.contains("integer literal"), err.getMessage)
    // a foldable NULL knob is foldable AND int-typed — it must hit the
    // named error too, not unbox null to 0 and silently run with k=0
    val nullErr = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a b c'), CAST(NULL AS INT))").collect()
    }
    assert(nullErr.getMessage.contains("non-NULL integer literal"), nullErr.getMessage)
  }

  test("GraftExtensions registers winnow_positions for SQL users") {
    // 'abcabc' with k=2, w=2: fingerprints resolve without temp-function
    // plumbing and agree with the Column-level entry point used by the
    // winnowing operator
    val viaSql = spark.sql(
      "SELECT winnow_positions('abcabc', 2, 2) AS f").head().getSeq[org.apache.spark.sql.Row](0)
    assert(viaSql.nonEmpty)
    val viaColumn = spark.range(1)
      .select(graft.functions.WinnowPositions.winnowPositions(
        org.apache.spark.sql.functions.lit("abcabc"), 2, 2).as("f"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(viaSql === viaColumn)
  }
}
