package graft

import org.apache.spark.sql.functions._

import graft.similarity.Quantize

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),  // degenerate
    (3L, Array(-2.0f, 1.0f, 0.5f, -0.25f))
  ).toDF("vec_id", "embedding")

  private lazy val out = Quantize.toInt8(df, "embedding")
    .collect().map(r => r.getLong(0) ->
      ((r.getLong(2), r.getSeq[Byte](3).toList))).toMap

  test("max element maps to ±127, others proportionally") {
    assert(out(1L)._2 === List[Byte](127, -64, 32, 0))
    assert(out(3L)._2 === List[Byte](-127, 64, 32, -16))
  }

  test("zero vectors quantize to zeros with scale 0") {
    assert(out(2L) === ((0L, List[Byte](0, 0, 0, 0))))
  }

  test("scale dequantizes the max element back exactly") {
    // scale_micro = round(maxabs/127 · 1e6); maxabs=1.0 → 7874
    assert(out(1L)._1 === 7874L)
    val approx = out(1L)._1 / 1e6 * 127
    assert(math.abs(approx - 1.0) < 1e-3)
  }

  test("dequantization error is bounded by scale/2 per element") {
    val rows = Quantize.toInt8(df.filter($"vec_id" =!= 2L), "embedding")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"), $"q8", $"scale_micro")
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val q = r.getSeq[Byte](2)
      val scale = r.getLong(3) / 1e6
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x - qi * scale) <= scale / 2 + 1e-9,
          s"vec ${r.getLong(0)}: $x vs ${qi * scale}")
      }
    }
  }
}
