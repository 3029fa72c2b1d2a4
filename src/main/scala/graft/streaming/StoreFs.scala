package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Store-directory probes for the foreachBatch dedup cadences, resolved
  * through the Hadoop FileSystem of the ACTIVE SESSION — not
  * `java.io.File`, which silently answers "absent" for every path on a
  * non-local filesystem (HDFS/S3 — where a 100 TB store actually
  * lives): replay markers would never be seen, every restart would
  * re-process appended batches, and an overwrite-mode bootstrap would
  * destroy the store it failed to detect. */
private[streaming] object StoreFs {

  private def fsAndPath(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Has the `_graft_batch_<id>` replay marker been written? */
  def markerExists(spark: SparkSession, dir: String, batchId: Long): Boolean = {
    val (fs, p) = fsAndPath(spark, dir)
    fs.exists(new Path(p, s"_graft_batch_$batchId"))
  }

  /** Record that `batchId`'s append landed (idempotent overwrite). */
  def writeMarker(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val (fs, p) = fsAndPath(spark, dir)
    fs.create(new Path(p, s"_graft_batch_$batchId"), true).close()
  }

  /** Does the directory hold a parquet store (data files or _SUCCESS)? */
  def storeExists(spark: SparkSession, dir: String): Boolean = {
    val (fs, p) = fsAndPath(spark, dir)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      n == "_SUCCESS" || n.endsWith(".parquet")
    }
  }
}
