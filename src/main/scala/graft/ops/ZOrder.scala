package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) clustering keys — the multi-dimensional data-layout
  * technique of Delta/Iceberg `ZORDER BY`: interleaving the bits of two
  * bucketed dimensions gives a single sort key whose prefix ranges are
  * 2-D tiles, so a range-partitioned write clusters rows that are close
  * in BOTH dimensions into the same files and min/max file statistics
  * prune on either predicate.
  *
  * Everything is integer shift/mask arithmetic (the classic bit-spread
  * with magic masks) — codegen'd per-row, zero shuffle to compute, and
  * bit-identical in any engine, so layout decisions replay exactly.
  *
  * At 100 TB the win is at SCAN time: a query filtering on either
  * dimension skips the files whose z-range cannot contain it. The
  * operator computes the key and the layout API realizes it with
  * `repartitionByRange` + in-partition sort — Spark's writer then emits
  * one file per range, which IS the z-tiling.
  */
object ZOrder {

  /** Spread a 16-bit value's bits to the even positions of 32 bits.
    * All arithmetic is 64-bit: a 32-bit accumulator would sign-overflow
    * at z = 0xFFFFFFFF and break the unsigned ordering contract.
    */
  private def spread16(x: Column): Column = {
    val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
    val shifts = Seq(8, 4, 2, 1)
    var v = x.cast(LongType).bitwiseAND(lit(0xFFFFL))
    shifts.zip(m).foreach { case (s, mask) =>
      v = v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(mask))
    }
    v
  }

  /** The 32-bit Morton interleave of two 16-bit bucketed dimensions
    * (`a` in the even bits, `b` in the odd): both inputs are masked to
    * their low 16 bits — callers bucket coarser dimensions first
    * (e.g. `value % 65536`, a day index, a hash).
    */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Lay a frame out in z-order: range-partition on the interleave of
    * the two bucketed dimensions and sort within partitions — each
    * output partition (→ file) covers one z-range tile. `numFiles`
    * bounds the file count; the z column is kept as `zCol` for
    * stats/debug and can be dropped by the caller after the write.
    */
  def layoutByZ(df: DataFrame, a: Column, b: Column, numFiles: Int,
                zCol: String = "z"): DataFrame = {
    require(numFiles > 0, s"numFiles=$numFiles must be positive")
    df.withColumn(zCol, zValue2(a, b))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
  }
}
