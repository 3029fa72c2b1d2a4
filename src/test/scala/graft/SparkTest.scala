package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** Shared local session for all suites (getOrCreate → one JVM session). */
trait SparkTest { self: Suite =>
  lazy val spark: SparkSession = {
    val s = graft.core.Engine.configure(
      SparkSession.builder().master("local[4]").appName("graft-test")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-wh-").toString),
      shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"

  /** Every [[graft.plans.DeferredServeExec]] in an EXECUTED frame's
    * physical plan, descending through the AQE wrappers (a materialized
    * stage exposes its child only via `.plan`) — ONE copy of the walker
    * for every suite that pins a TVF's resolved inner plan. */
  def deferredServeNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[graft.plans.DeferredServeExec] = {
    def descend(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[graft.plans.DeferredServeExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        descend(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        descend(q.plan)
      case d: graft.plans.DeferredServeExec => Seq(d)
      case other => other.children.flatMap(descend)
    }
    descend(df.queryExecution.executedPlan)
  }
}
