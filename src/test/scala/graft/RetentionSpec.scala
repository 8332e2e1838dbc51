package graft

import java.sql.Timestamp

import graft.ops.Retention

class RetentionSpec extends SparkTestBase {
  import spark.implicits._

  // week boundaries: epoch-micros div 604800000000; 1970-01-01 was a
  // Thursday but the integer grid doesn't care — offsets are exact
  private def at(day: Int, hour: Int = 0) =
    new Timestamp((day.toLong * 86400L + hour * 3600L) * 1000L)

  private lazy val events = Seq(
    // cohort week 0: users 1, 2 sign up in days 0..6
    (1L, "signup", at(0)),
    (2L, "signup", at(3)),
    // u1 active week 1 and week 2; u2 only week 1
    (1L, "view", at(8)),
    (1L, "click", at(15)),
    (2L, "view", at(9)),
    // cohort week 1: user 3; active week 3 (offset 2)
    (3L, "signup", at(7)),
    (3L, "view", at(22)),
    // user 4 never signs up → in no cohort
    (4L, "view", at(1)),
    // u2's pre-signup activity in week 0 still counts (offset 0 dedups
    // with the signup itself)
    (2L, "view", at(1))
  ).toDF("user_id", "event_type", "ts")

  private lazy val out =
    Retention.cohortRetention(events, "user_id", "ts", "event_type",
        anchorType = "signup", maxWeeks = 4)
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))

  test("cohorts, offsets, sizes, and retention rates") {
    assert(out === Array(
      (0L, 0, 2L, 2L, 1.0),       // both cohort-0 users active week 0
      (0L, 1, 2L, 2L, 1.0),       // both return week 1
      (0L, 2, 2L, 1L, 0.5),       // only u1 returns week 2
      (1L, 0, 1L, 1L, 1.0),       // u3 anchors week 1
      (1L, 2, 1L, 1L, 1.0)))      // u3 returns week 3 (offset 2)
  }

  test("users without the anchor event are not cohorted") {
    assert(!out.exists(_._3 > 2L)) // no cohort ever counts user 4
  }
}
