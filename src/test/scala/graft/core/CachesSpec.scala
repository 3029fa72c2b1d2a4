package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** The cache-hygiene contract (VERDICT-r2 nit): operator-internal caches
  * must not stay pinned once the harness releases them. */
class CachesSpec extends AnyFunSuite with SparkTest {

  test("releaseAll unpins every operator-scoped cache") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // a query whose operators register several scoped caches (signature
    // table + closure labels + adjacency)
    graft.operators.Dedup.clusterClosureDecisions(docs, 0.5)
      .write.format("noop").mode("overwrite").save()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected materialized operator caches during the query")
    Caches.releaseAll()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"pinned RDDs survived releaseAll: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("releaseAll is idempotent and safe on an empty registry") {
    Caches.releaseAll()
    Caches.releaseAll()
  }
}
