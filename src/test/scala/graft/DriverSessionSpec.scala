package graft

/** The driver smoke-checks `SparkEntry.entry` under ITS OWN session,
  * whose conf we do not control — in particular Spark 4's default
  * `spark.sql.parquet.inferTimestampNTZ.enabled=true`, under which the
  * regenerated testdata's naive timestamp[us] columns read as
  * TIMESTAMP_NTZ (the round-10 breakage class: `unix_micros` rejects
  * NTZ). This spec runs the entry query plus the most timestamp-heavy
  * registry queries in a child session with NTZ inference ON, pinning
  * the cast-hardening layer that keeps them runnable either way.
  */
class DriverSessionSpec extends SparkTestBase {

  private def ntzSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    s
  }

  test("entry() runs and returns rows under an NTZ-inferring session") {
    assert(SparkEntry.entry(ntzSession).count() > 0)
  }

  test("timestamp-heavy queries run under an NTZ-inferring session") {
    val s = ntzSession
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q_sessionize", "q_funnel", "q_retention", "q_anomaly",
        "q_asof_join", "q_decayed_sum", "q_resample_daily", "q_w4_initial_date"))
      assert(SparkEntry.queries(q)(s, dir).count() >= 0, s"$q failed under NTZ")
  }
}
