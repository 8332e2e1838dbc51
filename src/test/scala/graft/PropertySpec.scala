package graft

import org.apache.spark.sql.functions._

import graft.ops.Windows

/** Property-style tests over the window/dedup algebra (SURVEY.md §5.3):
  * randomized inputs from fixed seeds (deterministic across runs).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def gen(seed: Int): List[(Int, Int)] = {
    val rnd = new scala.util.Random(seed)
    val n = 1 + rnd.nextInt(60)
    List.fill(n)((rnd.nextInt(4), rnd.nextInt(2001) - 1000))
  }

  test("rolling min <= avg <= max; count bounded by frame") {
    (1 to 15).foreach { seed =>
      val df = gen(seed).zipWithIndex.map { case ((k, v), i) => (k, i, v.toDouble) }
        .toDF("k", "i", "v")
      val w = Windows.rolling(Seq($"k"), Seq($"i"), 5)
      val rows = df.select(
        Windows.rollingMin($"v", w).as("mn"),
        Windows.rollingAvg($"v", w).as("av"),
        Windows.rollingMax($"v", w).as("mx"),
        count($"v").over(w).as("c")).collect()
      rows.foreach { r =>
        assert(r.getDouble(0) <= r.getDouble(1) + 1e-9, s"seed=$seed")
        assert(r.getDouble(1) <= r.getDouble(2) + 1e-9, s"seed=$seed")
        assert(r.getLong(3) >= 1 && r.getLong(3) <= 5, s"seed=$seed")
      }
    }
  }

  test("W2 group-total window equals groupBy sum joined back") {
    (1 to 8).foreach { seed =>
      val df = gen(seed).zipWithIndex.map { case ((k, v), i) => (k, i, v.toDouble) }
        .toDF("k", "i", "v")
      val viaWindow = df.select($"k", Windows.groupTotal($"v", Seq($"k")).as("t"))
        .distinct().orderBy("k").collect().map(r => (r.getInt(0), r.getDouble(1)))
      val viaGroup = df.groupBy($"k").agg(sum($"v").as("t"))
        .orderBy("k").collect().map(r => (r.getInt(0), r.getDouble(1)))
      assert(viaWindow.toSeq === viaGroup.toSeq, s"seed=$seed")
    }
  }

  test("keepFirst output keys are unique and cover the input key set") {
    (1 to 8).foreach { seed =>
      val data = gen(seed)
      val df = data.zipWithIndex.map { case ((k, v), i) => (k, i, v) }
        .toDF("k", "i", "v")
      val out = graft.ops.Dedup.keepFirst(df, Seq("k"), Seq($"i"))
      val keys = out.select("k").collect().map(_.getInt(0))
      assert(keys.length === keys.distinct.length, s"seed=$seed")
      assert(keys.toSet === data.map(_._1).toSet, s"seed=$seed")
    }
  }

  test("rolling median exact lies within [min, max] and equals sorted-middle") {
    (1 to 8).foreach { seed =>
      val df = gen(seed).zipWithIndex.map { case ((k, v), i) => (k, i, v.toDouble) }
        .toDF("k", "i", "v")
      val w = Windows.rolling(Seq($"k"), Seq($"i"), 7)
      val rows = df.select(
        Windows.rollingMin($"v", w), Windows.rollingMedianExact($"v", w),
        Windows.rollingMax($"v", w)).collect()
      rows.foreach { r =>
        assert(r.getDouble(0) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(2), s"seed=$seed")
      }
    }
  }

  test("applyChanges is partition-invariant and idempotent on re-apply") {
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val snap = (1L to 20L).map(k => (k, rnd.nextInt(100).toDouble))
        .toDF("k", "v")
      // unique (seq) per key by construction: seq = k*10 + draw index
      val ch = (1L to 20L).filter(_ => rnd.nextBoolean()).flatMap { k =>
        (0 until 1 + rnd.nextInt(2)).map { i =>
          (k, rnd.nextInt(100).toDouble,
            if (rnd.nextBoolean()) "U" else "D", k * 10 + i)
        }
      }.toDF("k", "v", "op", "seq")
      val once = graft.ops.Merge.applyChanges(snap, ch, Seq("k"), "seq", "op")
      val shuffled = graft.ops.Merge.applyChanges(
        snap.repartition(7), ch.repartition(5), Seq("k"), "seq", "op")
      assert(once.orderBy("k").collect().toSeq ===
        shuffled.orderBy("k").collect().toSeq, s"seed=$seed")
      // re-applying the same batch replays the same winners → fixpoint
      val twice = graft.ops.Merge.applyChanges(once, ch, Seq("k"), "seq", "op")
      assert(twice.orderBy("k").collect().toSeq ===
        once.orderBy("k").collect().toSeq, s"seed=$seed")
    }
  }

  test("boilerplate stripping is partition-invariant") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 30L).map { id =>
        val words = List.fill(5 + rnd.nextInt(10))(s"w${rnd.nextInt(12)}")
        (id, s"s${id % 3}", words.mkString(" "))
      }.toDF("id", "src", "text")
      val a = graft.text.Boilerplate.stripBoilerplate(docs, "id", "text", "src", 3, 5)
        .orderBy("id").collect().toSeq
      val b = graft.text.Boilerplate.stripBoilerplate(
          docs.repartition(7), "id", "text", "src", 3, 5)
        .orderBy("id").collect().toSeq
      assert(a === b, s"seed=$seed")
    }
  }

  test("funnel detail is partition-invariant") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val types = Seq("view", "click", "purchase", "noise")
      val ev = (1 to 200).map { i =>
        (rnd.nextInt(10).toLong, types(rnd.nextInt(4)),
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L))
      }.toDF("user_id", "event_type", "ts")
      def run(df: org.apache.spark.sql.DataFrame) =
        graft.ops.Funnel.firstTouch(df, "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"), 86400L * 1000000L)
          .orderBy("user_id").collect().toSeq
      assert(run(ev) === run(ev.repartition(9)), s"seed=$seed")
    }
  }
}
