package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Ann, SemanticDecontam}

class SemanticDecontamSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
  private lazy val bench = emb.filter(col("vec_id") % 10 === 1)
  private lazy val train = emb.filter(col("vec_id") % 10 =!= 1)

  test("flag: every flagged doc's evidence matches brute-force argmax; recall 1.0") {
    val flagged = SemanticDecontam.flagSemanticContaminated(train, bench, tau = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // independent ground truth: full product via crossJoin, argmax in Scala
    val b = bench.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val truth = train.select("vec_id", "embedding").collect().flatMap { r =>
      val id = r.getLong(0); val v = r.getSeq[Float](1).toArray
      def cos(a: Array[Float], c: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i).toDouble * c(i); na += a(i).toDouble * a(i); nb += c(i).toDouble * c(i); i += 1 }
        BigDecimal(d / math.sqrt(na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val scored = b.map { case (bid, bv) => (bid, cos(v, bv)) }.filter(_._2 >= 0.3)
      if (scored.isEmpty) None
      else Some(id -> scored.minBy { case (bid, c) => (-c, bid) })
    }.toMap

    assert(flagged.keySet === truth.keySet, "flagged doc set must be exact (recall 1.0)")
    truth.foreach { case (id, (bid, c)) =>
      assert(flagged(id)._1 === bid, s"doc $id: evidence bench id")
      assert(math.abs(flagged(id)._2 - c) < 1e-9, s"doc $id: evidence cosine")
    }
    assert(truth.nonEmpty, "fixture must exercise the flag path")
    assert(truth.size < train.count(), "fixture must leave clean docs")
  }

  test("remove: exactly train minus flagged ids, schema preserved") {
    val flaggedIds = SemanticDecontam.flagSemanticContaminated(train, bench, tau = 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    val kept = SemanticDecontam.removeSemanticContaminated(train, bench, tau = 0.3)
    assert(kept.schema === train.schema, "filter form must be schema-preserving")
    val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    val trainIds = train.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptIds === (trainIds diff flaggedIds))
  }

  test("remove plan: broadcast nested-loop anti join, no exchange, no sort-merge") {
    val plan = SemanticDecontam.removeSemanticContaminated(train, bench, tau = 0.3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast nested-loop anti join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no sort-merge join expected:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the remove form must not shuffle the corpus:\n$plan")
  }

  test("flag plan: bench broadcast + partial aggregate before the only exchange") {
    val plan = SemanticDecontam.flagSemanticContaminated(train, bench, tau = 0.3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"bench side must broadcast:\n$plan")
    // partial_min must appear (map-side combine of the NxB product)
    assert(plan.contains("partial_min") || plan.contains("partial_"),
      s"the evidence fold must be a partial aggregate:\n$plan")
  }

  test("indexed flag = argmax fold of the index detector's pairs; subset of exact") {
    val idx = java.nio.file.Files.createTempDirectory("semdecon_idx").resolve("idx").toString
    Ann.writeEmbedNearDupIndex(bench, idx, nBits = 8)
    val viaIndex = SemanticDecontam.flagSemanticContaminatedAgainstIndex(train, idx, tau = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // ground truth from the from-raw incremental detector (same geometry)
    val pairs = Ann.embeddingNearDupsAgainstCorpus(train, bench, threshold = 0.3, nBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val truth = pairs.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map { case (_, bid, c) => (bid, c) }.minBy { case (bid, c) => (-c, bid) }
    }
    assert(viaIndex === truth, "indexed fold must equal from-raw detector fold")

    // LSH recall contract: a subset of the exact flag set, evidence never better
    val exact = SemanticDecontam.flagSemanticContaminated(train, bench, tau = 0.3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(viaIndex.keySet.subsetOf(exact.keySet))
    viaIndex.foreach { case (id, (_, c)) =>
      assert(c <= exact(id) + 1e-9, s"doc $id: index evidence can't beat exact max")
    }
    assert(viaIndex.nonEmpty, "fixture must exercise the indexed path")
  }

  test("handle-based flag/remove ≡ the path-based indexed forms") {
    val idx = java.nio.file.Files.createTempDirectory("semdecon_idx_h").resolve("idx").toString
    Ann.writeEmbedNearDupIndex(bench, idx, nBits = 8)
    val handle = Ann.openEmbedNearDupIndex(spark, idx)
    val viaPath = SemanticDecontam.flagSemanticContaminatedAgainstIndex(train, idx, tau = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val viaHandle = SemanticDecontam.flagSemanticContaminatedAgainstHandle(train, handle, tau = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(viaHandle === viaPath)
    assert(viaHandle.nonEmpty)
    val keptPath = SemanticDecontam.removeSemanticContaminatedAgainstIndex(train, idx, tau = 0.3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val keptHandle = SemanticDecontam.removeSemanticContaminatedAgainstHandle(train, handle, tau = 0.3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptHandle === keptPath)
  }

  test("removeAgainstIndex = train minus indexed-flag ids") {
    val idx = java.nio.file.Files.createTempDirectory("semdecon_idx_rm").resolve("idx").toString
    Ann.writeEmbedNearDupIndex(bench, idx, nBits = 8)
    val flaggedIds = SemanticDecontam.flagSemanticContaminatedAgainstIndex(train, idx, tau = 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    val keptIds = SemanticDecontam.removeSemanticContaminatedAgainstIndex(train, idx, tau = 0.3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val trainIds = train.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptIds === (trainIds diff flaggedIds))
  }

  test("tie-break: equal top cosines resolve to the MIN bench id, deterministically") {
    import spark.implicits._
    val v = Array.fill(8)(0.5f)
    val tr = Seq((100L, v)).toDF("vec_id", "embedding")
    // two bench copies of the same vector -> identical cosine 1.0
    val be = Seq((7L, v), (3L, v), (9L, v.map(-_))).toDF("vec_id", "embedding")
    val out = SemanticDecontam.flagSemanticContaminated(tr, be, tau = 0.3).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 3L, "min bench id must win the tie")
    assert(out.head.getDouble(2) === 1.0)
    // repartition invariance
    val out2 = SemanticDecontam.flagSemanticContaminated(tr.repartition(5), be.repartition(3), tau = 0.3).collect()
    assert(out2.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("doc present in both tables flags itself at cosine 1.0 (no self-exclusion)") {
    import spark.implicits._
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val tr = Seq((5L, v)).toDF("vec_id", "embedding")
    val be = Seq((5L, v)).toDF("vec_id", "embedding")
    val out = SemanticDecontam.flagSemanticContaminated(tr, be, tau = 0.9).collect()
    assert(out.length === 1 && out.head.getDouble(2) === 1.0,
      "a doc that IS the benchmark item is the definition of contamination")
  }

  test("zero-norm train vector never flags (NaN guarded to NULL)") {
    import spark.implicits._
    val tr = Seq((1L, Array.fill(8)(0f))).toDF("vec_id", "embedding")
    val be = Seq((2L, Array.fill(8)(1f))).toDF("vec_id", "embedding")
    assert(SemanticDecontam.flagSemanticContaminated(tr, be, tau = 0.0).count() === 0)
    assert(SemanticDecontam.removeSemanticContaminated(tr, be, tau = 0.0).count() === 1,
      "a zero-norm doc is unscoreable, not contaminated — it survives the filter")
  }
}
