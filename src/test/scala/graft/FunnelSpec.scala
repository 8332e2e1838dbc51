package graft

import java.sql.Timestamp

import graft.ops.Funnel

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L
  private val steps = Seq("view", "click", "purchase")
  private val Day = 86400L * 1000000L

  private lazy val events = Seq(
    // u1 converts cleanly
    (1L, "view", ts("2024-01-01 10:00:00")),
    (1L, "click", ts("2024-01-01 11:00:00")),
    (1L, "purchase", ts("2024-01-01 12:00:00")),
    // u2 stalls at click
    (2L, "view", ts("2024-01-01 10:00:00")),
    (2L, "click", ts("2024-01-01 11:00:00")),
    // u3: click BEFORE the first view must not count; later click does
    (3L, "click", ts("2024-01-01 09:00:00")),
    (3L, "view", ts("2024-01-01 10:00:00")),
    (3L, "click", ts("2024-01-01 11:30:00")),
    // u4: view only
    (4L, "view", ts("2024-01-01 10:00:00")),
    // u5: never views (click+purchase only) → not in the funnel at all
    (5L, "click", ts("2024-01-01 10:00:00")),
    (5L, "purchase", ts("2024-01-01 11:00:00")),
    // u6: purchase lands beyond the horizon
    (6L, "view", ts("2024-01-01 10:00:00")),
    (6L, "click", ts("2024-01-01 11:00:00")),
    (6L, "purchase", ts("2024-01-09 10:00:01")),
    // u7: two views — the EARLIEST anchors; two clicks — earliest after t1 wins
    (7L, "view", ts("2024-01-02 08:00:00")),
    (7L, "view", ts("2024-01-01 08:00:00")),
    (7L, "click", ts("2024-01-03 09:00:00")),
    (7L, "click", ts("2024-01-02 09:00:00"))
  ).toDF("user_id", "event_type", "ts")

  private lazy val detail =
    Funnel.firstTouch(events, "user_id", "event_type", "ts", steps, 7 * Day)

  private lazy val rows = detail.collect().map { r =>
    r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
      Option(r.get(2)).map(_.asInstanceOf[Long]),
      Option(r.get(3)).map(_.asInstanceOf[Long]),
      r.getInt(4), r.getBoolean(5)))
  }.toMap

  test("complete conversion within horizon") {
    assert(rows(1L) === ((Some(us("2024-01-01 10:00:00")),
      Some(us("2024-01-01 11:00:00")), Some(us("2024-01-01 12:00:00")), 3, true)))
  }

  test("partial funnels report depth and NULL later steps") {
    assert(rows(2L) === ((Some(us("2024-01-01 10:00:00")),
      Some(us("2024-01-01 11:00:00")), None, 2, false)))
    assert(rows(4L)._4 === 1)
    assert(rows(4L)._5 === false)
  }

  test("steps before the anchor do not count") {
    assert(rows(3L)._2 === Some(us("2024-01-01 11:30:00")))
  }

  test("users who never reach step 1 are absent") {
    assert(!rows.contains(5L))
  }

  test("later steps beyond the horizon do not convert") {
    assert(rows(6L) === ((Some(us("2024-01-01 10:00:00")),
      Some(us("2024-01-01 11:00:00")), None, 2, false)))
  }

  test("earliest anchor and earliest qualifying successor win") {
    assert(rows(7L)._1 === Some(us("2024-01-01 08:00:00")))
    assert(rows(7L)._2 === Some(us("2024-01-02 09:00:00")))
  }

  test("horizon boundary is inclusive; same-instant step is not 'after'") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-08 00:00:00")),  // exactly t1 + horizon
      (2L, "view", ts("2024-01-01 00:00:00")),
      (2L, "click", ts("2024-01-01 00:00:00"))   // same instant as the view
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.firstTouch(ev, "user_id", "event_type", "ts",
        Seq("view", "click"), 7 * Day)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(1L).isDefined, "ts == t1 + horizon must still qualify")
    assert(out(2L).isEmpty, "strictly-after excludes the same instant")
  }

  test("summary counts per step with conversion shares") {
    val s = Funnel.summary(detail, steps).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // 6 users entered (u5 absent); 5 clicked; 1 purchased in-horizon
    assert(s === Array(
      (1, "view", 6L, 1.0),
      (2, "click", 5L, 0.833333),
      (3, "purchase", 1L, 0.166667)))
  }
}
