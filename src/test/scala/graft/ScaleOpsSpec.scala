package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.pipeline.Bucketing

class ScaleOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedSum equals direct groupBy sum") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val direct = df.groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, Seq("l_returnflag"), "l_quantity")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // integral-valued doubles: sums are exact in any order
    assert(salted === direct)
  }

  test("saltedJoin equals plain join") {
    val fact = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val dim = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = fact.join(dim, "l_orderkey").count()
    val salted = Skew.saltedJoin(fact, dim, "l_orderkey").count()
    assert(salted === plain)
  }

  test("keyHistogram surfaces heavy keys in order") {
    val h = Skew.keyHistogram(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
      Seq("l_returnflag"), topN = 3).collect()
    assert(h.length === 3)
    assert(h.map(_.getLong(1)).toSeq === h.map(_.getLong(1)).sortBy(-_).toSeq)
  }

  test("bucketed join plans with zero exchanges") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Seq("bkt_li", "bkt_o").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(li, "bkt_li", "l_orderkey", 4, Seq("l_orderkey"))
    Bucketing.writeBucketed(o, "bkt_o", "l_orderkey", 4, Seq("l_orderkey"))

    // at test scale the planner prefers broadcast; disable it so the plan
    // shows what a fact⋈fact join at 100 TB would do — SMJ over co-located
    // buckets, zero exchanges
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_li", "bkt_o", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === li.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE IF EXISTS bkt_li")
    spark.sql("DROP TABLE IF EXISTS bkt_o")
  }
}
