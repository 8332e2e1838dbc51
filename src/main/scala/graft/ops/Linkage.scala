package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy joins (record linkage) — matching entities across two
  * tables whose keys don't line up ("Jon Smyth" ↔ "John Smith"), the
  * classic master-data step of a warehouse ETL.
  *
  * The naive contract is a |L|×|R| cross join with an edit-distance
  * predicate — a nested loop no optimizer can save. The linkage answer
  * is BLOCKING: both sides compute a cheap deterministic block key (a
  * suffix, a phonetic code, a length band — chosen so true matches
  * agree on it), the join is a plain hash equi-join on the block, and
  * the quadratic edit-distance work happens only within blocks. Recall
  * is bounded by the blocking function (a corruption that changes the
  * block key escapes — callers union several complementary blockings
  * for high-recall linkage, each one still an equi-join).
  *
  * The residual filter uses Spark's THRESHOLD form of levenshtein —
  * `levenshtein(l, r, k)` abandons a row's DP early once the distance
  * provably exceeds k (O(k·min(m,n)) instead of O(m·n)), which is the
  * difference between a cheap residual and a quadratic one on long
  * strings.
  */
object Linkage {

  /** Link `left` to `right`: rows whose block keys agree and whose name
    * edit distance is ≤ `maxDistance`, as (left_id, right_id, distance).
    * `blockOf` derives the block key from a name column — the same
    * function applies to both sides.
    */
  def fuzzyJoin(left: DataFrame, leftId: String, leftName: String,
                right: DataFrame, rightId: String, rightName: String,
                blockOf: Column => Column, maxDistance: Int): DataFrame = {
    require(maxDistance >= 0, s"maxDistance=$maxDistance must be non-negative")
    val l = left.select(col(leftId).as("left_id"), col(leftName).as("__ln"),
      blockOf(col(leftName)).as("__blk"))
    val r = right.select(col(rightId).as("right_id"), col(rightName).as("__rn"),
      blockOf(col(rightName)).as("__blk"))
    val d = levenshtein(col("__ln"), col("__rn"), maxDistance)
    l.join(r, "__blk")
      .withColumn("distance", d)
      .filter(col("distance") =!= -1) // threshold form: -1 ⇔ above cutoff
      .select("left_id", "right_id", "distance")
  }
}
