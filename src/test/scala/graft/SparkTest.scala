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
}
