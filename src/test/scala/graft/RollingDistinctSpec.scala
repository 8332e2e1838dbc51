package graft

import org.apache.spark.sql.functions._

import graft.ops.RollingDistinct

class RollingDistinctSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val events = Seq(
    ("2024-01-01 08:00:00", 1L), ("2024-01-01 09:00:00", 2L),
    ("2024-01-01 10:00:00", 1L),                           // u1 twice same day
    ("2024-01-02 08:00:00", 1L),
    ("2024-01-05 23:59:59", 3L)
  ).toDF("t", "user_id").select(to_timestamp(col("t")).as("ts"), col("user_id"))

  private def run(w: Int): Map[String, Long] =
    RollingDistinct.activeKeys(events, "ts", "user_id", windowDays = w)
      .collect().map(r => r.getDate(0).toString -> r.getAs[Long]("active")).toMap

  test("trailing 3-day distinct users per observed day") {
    // day1: {1,2}; day2 window [day0..day2]: {1,2}; day5 window [day3..day5]: {3}
    assert(run(3) === Map(
      "2024-01-01" -> 2L, "2024-01-02" -> 2L, "2024-01-05" -> 1L))
  }

  test("windowDays=1 degenerates to daily distinct counts") {
    assert(run(1) === Map(
      "2024-01-01" -> 2L, "2024-01-02" -> 1L, "2024-01-05" -> 1L))
  }

  test("only observed days are reported; a key counts once per report day") {
    val days = run(7).keySet
    assert(days === Set("2024-01-01", "2024-01-02", "2024-01-05"))
    // u1 active on two days inside day-2's window must still count once
    assert(run(7)("2024-01-02") === 2L)
  }
}
