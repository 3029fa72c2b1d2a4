package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.streaming.{StoreAudit, StoreFs}

/** The maintenance loop (round 15): gauge → lever → gauge-reset, owned
  * by one idempotent call per family. Pinned here: the right lever for
  * the right finding (drift → rebuild, backlog → purge), answers
  * unchanged across a maintenance pass (the levers' own exactness
  * contracts, re-checked through the loop), the audit quiet
  * afterwards, and a second immediate call performing ZERO actions —
  * the property that makes an unconditional cron cadence safe. */
class MaintenanceSpec extends AnyFunSuite with SparkTest
    with org.scalatest.BeforeAndAfterEach {

  override def afterEach(): Unit = {
    graft.core.Caches.releaseAll()
    spark.catalog.clearCache()
  }

  private val Dim = 8

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-maint-").toString

  private def cluster(ids: Range, sign: Long) = {
    import spark.implicits._
    ids.map { i =>
      val v = (0 until Dim).map { j =>
        sign * 1000L * (j + 1) + ((i * 31 + j * 17) % 21) - 10L
      }.toArray
      (i.toLong, v)
    }.toDF("doc_id", "vec")
  }

  private def emb(ids: Range, scale: Double) = {
    import spark.implicits._
    ids.map { i =>
      val v = (0 until Dim).map { j =>
        scale * (0.02 * (j + 1) + 0.001 * ((i * 13 + j * 7) % 17))
      }.toArray
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def brute(vecs: org.apache.spark.sql.DataFrame,
                    queries: Seq[(Long, Long)], k: Int): Seq[String] = {
    import spark.implicits._
    val qp = queries.toDF("query_id", "probe_id")
    val probes = vecs.join(qp, col("doc_id") === col("probe_id"))
      .select(col("query_id"), col("probe_id"), col("vec").as("qvec"))
    vecs.crossJoin(broadcast(probes))
      .filter(col("doc_id") =!= col("probe_id"))
      .select(col("query_id"), col("doc_id"),
        graft.functions.VectorFunctions.dotLong(col("vec"), col("qvec"))
          .as("dot"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select("query_id", "doc_id", "dot", "rk")
      .collect().map(_.toString).sorted.toSeq
  }

  private def served(path: String, queries: Seq[(Long, Long)],
                     k: Int): Seq[String] =
    ExactIvf.topDotBatchFromStore(spark, path, queries, k, nprobe0 = 2)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("dot"),
        col("rk"))
      .collect().map(_.toString).sorted.toSeq

  test("vec: drift pulls the recluster lever; answers unchanged; second pass is a no-op") {
    val a = cluster(0 until 100, +1L)
    val b = cluster(100 until 200, -1L)
    val path = tmp()
    ExactIvf.writeVecStore(a, path, nCells = 2, iters = 1)
    ExactIvf.appendToVecStore(spark, b, path)
    val queries = Seq((1L, 7L), (2L, 150L))
    val expected = brute(a.unionAll(b), queries, 15)
    assert(served(path, queries, 15) == expected)
    val acts = StoreMaintenance.maintainVecStore(spark, path)
    assert(acts.map(_.action) == Seq("recluster"), acts.toString)
    // the lever reset its gauge and the serve is untouched
    assert(served(path, queries, 15) == expected)
    assert(!StoreAudit.auditFindings(spark, path)
      .exists(f => f.check == "drift" && f.level == "warn"))
    assert(StoreMaintenance.maintainVecStore(spark, path).isEmpty)
  }

  test("vec: a tombstone backlog without drift pulls the purge lever only") {
    val a = cluster(0 until 200, +1L)
    val path = tmp()
    ExactIvf.writeVecStore(a, path, nCells = 2, iters = 1)
    import spark.implicits._
    ExactIvf.deleteFromVecStore(spark,
      Seq(3L, 5L, 8L).toDF("doc_id"), path, idCol = "doc_id")
    val queries = Seq((1L, 7L))
    val expected = brute(a.filter(!col("doc_id").isin(3L, 5L, 8L)),
      queries, 10)
    assert(served(path, queries, 10) == expected)
    val acts = StoreMaintenance.maintainVecStore(spark, path)
    assert(acts.map(_.action) == Seq("purge-compact"), acts.toString)
    assert(served(path, queries, 10) == expected)
    // tombstones cleared → the compliance clock stops
    assert(!StoreAudit.auditFindings(spark, path)
      .exists(_.check == "tombstones"))
    assert(StoreMaintenance.maintainVecStore(spark, path).isEmpty)
  }

  test("ivfadc: drift pulls the retrain lever at the recorded geometry; second pass is a no-op") {
    val path = tmp()
    val base = emb(0 until 150, 1.0)
    val drifted = emb(150 until 200, 50.0)
    Pq.writeIvfadcStore(base, path, nCells = 2, m = 2, dim = Dim,
      nCents = 4, iters = 1)
    Pq.appendToIvfadcStore(spark, drifted, path, m = 2, dim = Dim,
      batchId = Some(1L))
    val all = base.unionAll(drifted)
    val acts = StoreMaintenance.maintainIvfadcStore(spark, all, path,
      iters = 1)
    assert(acts.map(_.action) == Seq("retrain"), acts.toString)
    // gauge reset: fresh build stats in the new epoch, no batch stats
    assert(!StoreAudit.auditFindings(spark, path)
      .exists(f => f.check == "drift" && f.level == "warn"))
    // the retrained store serves (its answers are pinned retrain ≡
    // fresh-build in ReclusterSpec; here the loop wiring is the claim)
    val probes = Seq(7L)
    assert(Pq.ivfadcTopKFromStore(spark, path, all, probes, nprobe = 2,
      kShort = 30, k = 5, m = 2, dim = Dim).count() == 5L)
    assert(StoreMaintenance.maintainIvfadcStore(spark, all, path,
      iters = 1).isEmpty)
  }

  test("index: a backlog pulls the purge; a clean store is a no-op") {
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      (i, s"spark stream doc $i " + ("filler " * (i % 5).toInt)))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.writeIndexStore(docs, path)
    assert(StoreMaintenance.maintainIndexStore(spark, path).isEmpty)
    Retrieval.deleteFromIndexStore(spark, Seq(2L, 4L).toDF("doc_id"),
      path)
    val acts = StoreMaintenance.maintainIndexStore(spark, path)
    assert(acts.map(_.action) == Seq("purge-compact"), acts.toString)
    assert(!StoreAudit.auditFindings(spark, path)
      .exists(_.check == "tombstones"))
    // the purged serve answers over the survivors (stats shifted)
    val r = Retrieval.bm25TopKFromStore(spark, path,
      Seq("spark"), 5)
    assert(!r.collect().exists(x => Set(2L, 4L)(x.getAs[Long]("doc_id"))))
    assert(StoreMaintenance.maintainIndexStore(spark, path).isEmpty)
  }
}
