package graft

import org.apache.spark.sql.functions._

import graft.ops.ZOrder

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def z(a: Int, b: Int): Long = {
    val df = Seq((a, b)).toDF("a", "b")
    df.select(ZOrder.zValue2(col("a"), col("b")).as("z")).head().getLong(0)
  }

  test("known interleaves") {
    assert(z(0, 0) === 0L)
    assert(z(1, 0) === 1L)          // a occupies the even bits
    assert(z(0, 1) === 2L)          // b occupies the odd bits
    assert(z(3, 0) === 5L)          // 0b11 -> 0b101
    assert(z(0, 3) === 10L)         // 0b11 -> 0b1010
    assert(z(5, 3) === 27L)         // 0b101 ⊗ 0b011 = 0b11011
    assert(z(0xFFFF, 0xFFFF) === 0xFFFFFFFFL) // full 32-bit range
  }

  test("inputs are masked to 16 bits") {
    assert(z(0x1FFFF, 0) === z(0xFFFF, 0))
  }

  test("monotone in one dimension when the other is fixed") {
    val rows = (0 until 256).map(a => z(a, 77))
    assert(rows === rows.sorted, "fixed-b slices must be monotone in a")
    val cols = (0 until 256).map(b => z(77, b))
    assert(cols === cols.sorted, "fixed-a slices must be monotone in b")
  }

  test("z-locality: quadrant prefix bits identify the 2-D tile") {
    // the top two bits of a 32-bit z split the 65536² space into 4
    // quadrants by (a < 2¹⁵, b < 2¹⁵)
    def quadrant(a: Int, b: Int): Long = z(a, b) >> 30
    assert(quadrant(100, 100) === 0L)
    assert(quadrant(40000, 100) === 1L)
    assert(quadrant(100, 40000) === 2L)
    assert(quadrant(40000, 40000) === 3L)
  }

  test("layoutByZ: partitions hold disjoint contiguous z-ranges") {
    val df = (0L until 4096L).toDF("id")
      .withColumn("a", (col("id") * 37) % 65536)
      .withColumn("b", (col("id") * 101) % 65536)
    val laid = ZOrder.layoutByZ(df, col("a"), col("b"), numFiles = 8)
    val ranges = laid
      .select(spark_partition_id().as("p"), col("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, "z-ranges must not overlap across partitions")
    }
  }
}
