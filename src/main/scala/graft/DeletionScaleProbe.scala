package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deletion-backlog cost probe at the SCALE regime (SCALE.md round 15
  * — VERDICT r14 #6): the round-14 DeletionProbe measured the
  * tombstone anti-join at fixture scale (5k-doc backlog), where the
  * build side always broadcasts. This probe rebuilds the measurement
  * at ≥10⁶ store rows with backlogs up to millions of tombstones — the
  * regime where the anti-join's build side crosses the broadcast
  * threshold and the join strategy itself changes — recording, per
  * backlog fraction: the serve median, the delete (tombstone-append)
  * cost, the anti-join's physical strategy (read off the executed
  * plan), and finally the purge cost and post-purge serve.
  *
  * Claims under test: (1) serve overhead tracks the BACKLOG FRACTION
  * (the anti-join runs on the already-pruned candidate side, never the
  * corpus); (2) when the build side stops broadcasting, the planner's
  * shuffled anti-join keeps the overhead fraction-tracking (the probe
  * side is already partitioned by the join key's hash from the
  * aggregation upstream — no new quadratic term); (3) purge restores
  * the zero-tombstone serve at one bounded compaction cost.
  *
  * Vectors are synthesized clustered (the GroupBoundProbe geometry) so
  * cell pruning behaves as it does on real embeddings.
  *
  * Usage: DeletionScaleProbe [nCells] [vecsPerCell] [dim] [nQueries]
  *   [k] [nprobe0] [pctsCsv] [reps]
  */
object DeletionScaleProbe {
  def main(args: Array[String]): Unit = {
    val nCells = args.headOption.map(_.toInt).getOrElse(4096)
    val vecsPerCell = args.lift(1).map(_.toInt).getOrElse(256)
    val dim = args.lift(2).map(_.toInt).getOrElse(32)
    val nQueries = args.lift(3).map(_.toInt).getOrElse(256)
    val k = args.lift(4).map(_.toInt).getOrElse(50)
    val nprobe0 = args.lift(5).map(_.toInt).getOrElse(4)
    val pcts = args.lift(6).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 10, 25))
    val reps = args.lift(7).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-deletion-scale-probe"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nSuper = 64
    val centroids = spark.range(nCells.toLong).select(
      col("id").as("ivf_cell"),
      transform(sequence(lit(0), lit(dim - 1)), j => {
        val s = pmod(col("id"), lit(nSuper.toLong))
        val base = ((s * 2654435761L + j.cast("long") * 40503L +
          lit(2166136261L)).bitwiseAND(lit(0x7fffffffL)) % 200001L) -
          100000L
        val jit = ((col("id") * 97L + j.cast("long") * 31L + 7L)
          .bitwiseAND(lit(0x7fffffffL)) % 4001L) - 2000L
        base + jit
      }).as("ccvm"))
    val cents = graft.core.Caches.scoped(centroids)
    val assigned = cents.select(col("ivf_cell"), col("ccvm"),
        explode(sequence(lit(0), lit(vecsPerCell - 1))).as("j"))
      .select(
        (col("ivf_cell") * vecsPerCell + col("j")).as("vec_id"),
        zip_with(col("ccvm"),
          sequence(lit(0), lit(dim - 1)).cast("array<long>"),
          (c, jj) => c + pmod(col("ivf_cell") * 13L + col("j") * 53L +
            jj * 17L, lit(101L)) - 50L).as("vm"),
        col("ivf_cell"))

    val path = java.nio.file.Files
      .createTempDirectory("graft-delscale-probe-").toString
    val t0 = System.nanoTime()
    graft.operators.ExactIvf.writeVecStoreAssigned(spark, assigned,
      cents, path, iters = 2)
    val nVecs = nCells.toLong * vecsPerCell
    println(f"""{"build_sec":${(System.nanoTime() - t0) / 1e9}%.1f,"n_cells":$nCells,"n_vecs":$nVecs,"dim":$dim}""")

    def h(a: Long, b: Long, m: Long): Long =
      ((a * 2654435761L + b * 40503L + 2166136261L) & 0x7fffffffL) % m
    // probes live in the vec_id % 100 >= 50 stripe, so no deletion
    // pct <= 50 ever tombstones a probe (deletes key on vec_id % 100);
    // needs vecsPerCell >= 100 so the walk stays inside the cell
    require(vecsPerCell >= 100, "vecsPerCell must be >= 100")
    val queries = (0 until nQueries).map { q =>
      val cell = h(q.toLong, 17L, nCells.toLong)
      var pid = cell * vecsPerCell + vecsPerCell - 1
      while (pid % 100 < 50) pid -= 1
      (q.toLong, pid)
    }

    def serve(label: String, backlog: Long): Unit = {
      val df = graft.operators.ExactIvf.topDotBatchFromStore(spark, path,
        queries, k, nprobe0)
      // execute FIRST, then read the plan (ADVICE r15): under AQE the
      // runtime-converted join can differ from the initial physical
      // plan, and the regime label must name the strategy the timed
      // runs actually used — the post-execution executedPlan reflects
      // AQE's final choice
      df.count()
      val anti = df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("LeftAnti"))
        .map(_.trim.dropWhile(!_.isLetter).takeWhile(_ != ' '))
        .toSeq.distinct.mkString("+")
      val times = (0 to reps).map { _ =>
        spark.catalog.clearCache()
        graft.core.Caches.releaseAll()
        val t = System.nanoTime()
        val n = graft.operators.ExactIvf.topDotBatchFromStore(spark, path,
          queries, k, nprobe0).count()
        require(n > 0)
        (System.nanoTime() - t) / 1e9
      }.drop(1).sorted
      val med = times(times.size / 2)
      println(f"""{"mode":"$label","tombs":$backlog,"serve_sec_median":$med%.2f,"anti_join":"$anti","reps":$reps}""")
    }

    serve("no_tombstones", 0L)
    var prevPct = 0
    for (pct <- pcts.sorted) {
      // delete the increment only — the standing backlog accumulates
      val del = spark.range(nVecs)
        .filter(pmod(col("id"), lit(100L)) >= prevPct &&
          pmod(col("id"), lit(100L)) < pct)
        .select(col("id").as("vec_id"))
      val td = System.nanoTime()
      graft.operators.ExactIvf.deleteFromVecStore(spark, del, path,
        idCol = "vec_id")
      val backlog = nVecs * pct / 100
      println(f"""{"delete_sec":${(System.nanoTime() - td) / 1e9}%.1f,"backlog":$backlog}""")
      serve(s"backlog_${pct}pct", backlog)
      prevPct = pct
    }
    // the over-threshold regime, measured explicitly: at 10⁷⁺
    // tombstones the build side stops broadcasting and the planner
    // falls back to a shuffled anti-join — force that plan here (AQE
    // re-conversion uses the same threshold, so -1 disables both) so
    // the fraction-tracking claim is measured in BOTH join regimes
    // without needing a 10⁸-row fixture
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try serve(s"backlog_${prevPct}pct_shuffled", nVecs * prevPct / 100)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    val tp = System.nanoTime()
    graft.operators.ExactIvf.compactVecStore(spark, path)
    println(f"""{"purge_sec":${(System.nanoTime() - tp) / 1e9}%.1f}""")
    serve("purged", 0L)
    spark.stop()
  }
}
