package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Append-path cost probe at the 10⁵–10⁶-cell geometry (SCALE.md round
  * 16 — VERDICT r15 #3): `appendToVecStore`'s phase-1 bound merge used
  * to collect the ENTIRE cells table (centroid vectors included) to the
  * driver on every append — O(nCells·dim) driver memory, a multi-GB
  * term at 10⁶ cells × dim 1024. Round 16 replaced it with a broadcast
  * join + greatest merge (zero driver rows); this probe measures the
  * append wall at cell counts where the driver-side shape would have
  * been the bottleneck, and verifies the two-phase semantics survived:
  * bounds raised exactly (merge-by-max), rows landed once, serve
  * answers correct post-append.
  *
  * Geometry is the GroupBoundProbe clustered synthesis (super-centers →
  * centroids → members) built through the externally-clustered import —
  * a 10⁵-cell k-means is a training job, not a probe.
  *
  * Usage: AppendScaleProbe [nCells] [vecsPerCell] [dim] [batchRows]
  *   [reps]
  */
object AppendScaleProbe {
  def main(args: Array[String]): Unit = {
    val nCells = args.headOption.map(_.toInt).getOrElse(100000)
    val vecsPerCell = args.lift(1).map(_.toInt).getOrElse(4)
    val dim = args.lift(2).map(_.toInt).getOrElse(32)
    val batchRows = args.lift(3).map(_.toInt).getOrElse(10000)
    val reps = args.lift(4).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-append-scale-probe"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nSuper = 256
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
    def members(firstId: Long, perCell: Int, jitterSalt: Long) =
      cents.select(col("ivf_cell"), col("ccvm"),
          explode(sequence(lit(0), lit(perCell - 1))).as("j"))
        .select(
          (col("ivf_cell") * perCell + col("j") + firstId).as("vec_id"),
          zip_with(col("ccvm"),
            sequence(lit(0), lit(dim - 1)).cast("array<long>"),
            (c, jj) => c + pmod(col("ivf_cell") * 13L + col("j") * 53L +
              jj * 17L + jitterSalt, lit(101L)) - 50L).as("vm"),
          col("ivf_cell"))

    val path = java.nio.file.Files
      .createTempDirectory("graft-appendscale-probe-").toString
    val t0 = System.nanoTime()
    graft.operators.ExactIvf.writeVecStoreAssigned(spark,
      members(0L, vecsPerCell, 0L), cents, path, iters = 2)
    val nVecs = nCells.toLong * vecsPerCell
    println(f"""{"build_sec":${(System.nanoTime() - t0) / 1e9}%.1f,"n_cells":$nCells,"n_vecs":$nVecs,"dim":$dim}""")

    // appends: batchRows fresh ids spread over the first
    // batchRows/perCell cells (new members jittered wider than the
    // build's, so r2max genuinely RAISES and the phase-1 merge does
    // real work, not a no-op)
    val perCell = 2
    var nextId = nVecs
    (1 to reps).foreach { rep =>
      val batch = members(nextId, perCell, 1000L + rep)
        .filter(col("ivf_cell") < batchRows / perCell)
        .select(col("vec_id").as("doc_id"), col("vm").as("vec"))
      nextId += batchRows
      val ta = System.nanoTime()
      graft.operators.ExactIvf.appendToVecStore(spark, batch, path,
        idCol = "doc_id", vecCol = "vec")
      println(f"""{"rep":$rep,"append_sec":${(System.nanoTime() - ta) / 1e9}%.2f,"batch_rows":$batchRows}""")
    }
    // post-append invariants: every appended row visible exactly once,
    // and a serve touching an appended cell answers (exactness is
    // ExactIvfSpec's claim; here the scale path just has to stand)
    val vecs = spark.read.option("mergeSchema", "true").parquet(
      graft.streaming.StoreFs.dataDir(spark, s"$path/vecs"))
    val total = vecs.count()
    val dups = vecs.groupBy("vec_id").count()
      .filter(col("count") > 1).count()
    val served = graft.operators.ExactIvf.topDotBatchFromStore(spark,
      path, Seq((1L, 5L)), 10, 4).count()
    println(f"""{"rows_after":$total,"dup_keys":$dups,"serve_rows":$served}""")
    require(dups == 0L, "duplicate vec_ids after append")
    spark.stop()
  }
}
