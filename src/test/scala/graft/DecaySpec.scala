package graft

import java.sql.Timestamp

import graft.ops.Decay

class DecaySpec extends SparkTestBase {
  import spark.implicits._

  private val DayMs = 86400000L
  // reference: epoch day 1000
  private val ref = 1000L
  private def at(day: Long) = new Timestamp(day * DayMs)

  private lazy val df = Seq(
    (1L, at(1000), 10.0), // age 0  → weight 1.0
    (1L, at(993), 10.0),  // age 7 = one half-life → weight 0.5
    (1L, at(986), 10.0),  // age 14 → 0.25
    (2L, at(1005), 4.0),  // future row → clamped to age 0
    (2L, at(300), 1000.0) // ancient → weight ~0
  ).toDF("user_id", "ts", "value")

  private lazy val out =
    Decay.decayedSumPerKey(df, "user_id", "ts", "value",
        refEpochDay = ref, halfLifeDays = 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap

  test("half-life weighting: 10·(1 + 0.5 + 0.25)") {
    val (n, milli, v) = out(1L)
    assert(n === 3L)
    // v_milli=10000 each; weights 1e6, 5e5, 2.5e5 → Σ = 10000·1750000
    assert(milli === 10000L * 1750000L)
    assert(v === 17.5)
  }

  test("future rows clamp to full weight; ancient rows decay to ~zero") {
    val (n, milli, v) = out(2L)
    assert(n === 2L)
    // 4.0 at age 0 → 4000·1e6 = 4e9; the 700-day-old 1000.0 rounds to w=0
    assert(milli === 4000L * 1000000L)
    assert(v === 4.0)
  }

  test("deterministic under repartitioning (exact integer partials)") {
    val again = Decay.decayedSumPerKey(df.repartition(7), "user_id", "ts",
        "value", ref, 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again === out.view.mapValues(_._2).toMap)
  }
}
