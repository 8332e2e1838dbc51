package graft

import graft.ops.ZoneMap

class ZoneMapSpec extends SparkTestBase {
  import spark.implicits._

  // 100 rows, value 0..99; clustered layout: bucket = v/10 (10 tight
  // zones); scattered layout: bucket = v%10 (every zone spans 0..9x).
  private lazy val rows = (0 until 100).map(v => (v / 10, v % 10, v))
    .toDF("b_range", "b_hash", "v")

  private lazy val probes = Seq((1, 25, 34), (2, 0, 99)).toDF("probe_id", "lo", "hi")

  test("zones carry exact min/max/count per bucket") {
    val z = ZoneMap.zones(rows, "b_range", "v").collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(z(2) === ((20, 29, 10L)))
    assert(z.size === 10)
  }

  test("clustered layout prunes a narrow probe to its overlapping zones") {
    val z = ZoneMap.zones(rows, "b_range", "v")
    val out = ZoneMap.probeScanStats(z, probes).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // probe [25,34] overlaps zones 2 and 3 only -> 2 buckets, 20 rows
    assert(out(1) === ((2L, 20L)))
    // the full-range probe scans everything
    assert(out(2) === ((10L, 100L)))
  }

  test("scattered layout cannot prune: every zone spans the domain") {
    val z = ZoneMap.zones(rows, "b_hash", "v")
    val out = ZoneMap.probeScanStats(z, probes).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every v%10 bucket has min<=25 and max>=34 -> all 10 scanned
    assert(out(1) === ((10L, 100L)))
    assert(out(2) === ((10L, 100L)))
  }

  test("probe boundaries are inclusive on both ends") {
    val z = ZoneMap.zones(rows, "b_range", "v")
    val edge = Seq((1, 29, 30)).toDF("probe_id", "lo", "hi")
    val out = ZoneMap.probeScanStats(z, edge).collect()
    // touches zone 2 at its max (29) and zone 3 at its min (30)
    assert(out.head.getLong(1) === 2L)
  }
}
