package graft

import org.apache.spark.sql.functions._

import graft.functions.NgramArray

class NgramArraySpec extends SparkTestBase {
  import spark.implicits._

  /** The interpreted HOF formulation the expression replaced — kept here
    * as the semantic reference.
    */
  private def hofNgrams(toks: org.apache.spark.sql.Column, n: Int) = {
    val grams = transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  test("codegen ngrams == interpreted HOF ngrams on real documents") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(split(col("text"), "\\s+").as("tk"))
    for (n <- Seq(1, 2, 3, 13)) {
      val bad = d.select(NgramArray.ngrams(col("tk"), n).as("fast"),
          hofNgrams(col("tk"), n).as("ref"))
        .filter(not(col("fast") === col("ref"))).count()
      assert(bad === 0, s"n=$n: codegen and HOF n-grams diverged")
    }
  }

  test("short inputs: fewer than n tokens is an empty array, n==size is one gram") {
    val df = Seq(Seq("a", "b"), Seq("a", "b", "c"), Seq.empty[String])
      .toDF("tk")
    val out = df.select(NgramArray.ngrams($"tk", 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq.empty)
    assert(out(1) === Seq("a b c"))
    assert(out(2) === Seq.empty)
  }

  test("n=1 is the token list itself") {
    val out = Seq(Seq("x", "y")).toDF("tk")
      .select(NgramArray.ngrams($"tk", 1)).head().getSeq[String](0)
    assert(out === Seq("x", "y"))
  }

  test("null input propagates null") {
    val df = Seq((1, null: Array[String])).toDF("id", "tk")
    assert(df.select(NgramArray.ngrams($"tk", 3)).head().isNullAt(0))
  }
}
