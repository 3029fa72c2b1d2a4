package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup-geometry probe for the coarse-over-coarse bound level
  * (VERDICT r13 #1, SCALE.md): measures PER-SERVE BOUND ROWS and serve
  * wall at 10⁵-cell-class exact-IVF geometry, grouped vs flat. The
  * flat plan bounds every (query, cell) pair — |q|·nCells rows — which
  * at 10⁵–10⁶ cells × a 4096-query chunk is 10⁹–10¹⁰ centroid dots per
  * serve batch; the grouped plan pays |q|·√nCells group bounds plus
  * only the cells of seed + surviving groups.
  *
  * The store is built through [[graft.operators.ExactIvf
  * .writeVecStoreAssigned]] (the externally-clustered import path): a
  * full k-means at 10⁵ cells is a training-cluster job, not a probe,
  * and serve exactness never depends on HOW cells were assigned — only
  * on r2max covering the actual member residuals, which the build
  * computes from the assignment. Vectors are synthesized around
  * clustered centroids (super-centers → centroids → members) so the
  * geometry has the structure real-model embeddings have — the regime
  * the group bound exists for.
  *
  * Usage: GroupBoundProbe [nCells] [vecsPerCell] [dim] [nSuper]
  * [nQueries] [k] [nprobe0]
  */
object GroupBoundProbe {
  def main(args: Array[String]): Unit = {
    val nCells = args.headOption.map(_.toInt).getOrElse(100000)
    val vecsPerCell = args.lift(1).map(_.toInt).getOrElse(4)
    val dim = args.lift(2).map(_.toInt).getOrElse(32)
    val nSuper = args.lift(3).map(_.toInt).getOrElse(256)
    val nQueries = args.lift(4).map(_.toInt).getOrElse(256)
    val k = args.lift(5).map(_.toInt).getOrElse(50)
    val nprobe0 = args.lift(6).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-groupbound-probe"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic clustered synthesis, all in the integer contract:
    // super-center s has components in ±100000; centroid c jitters its
    // super by ±2000; member v jitters its centroid by ±50
    def h(a: Long, b: Long, m: Long): Long =
      ((a * 2654435761L + b * 40503L + 2166136261L) & 0x7fffffffL) % m
    val centroids = spark.range(nCells.toLong).select(
      col("id").as("ivf_cell"),
      transform(sequence(lit(0), lit(dim - 1)), j => {
        val s = pmod(col("id"), lit(nSuper.toLong))
        val base = (shiftLeft(s * 2654435761L + j.cast("long") * 40503L +
          lit(2166136261L), 0).bitwiseAND(lit(0x7fffffffL)) % 200001L) -
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
      .createTempDirectory("graft-groupbound-probe-").toString
    val t0 = System.nanoTime()
    graft.operators.ExactIvf.writeVecStoreAssigned(spark, assigned,
      cents, path, iters = 2)
    println(f"""{"build_sec":${(System.nanoTime() - t0) / 1e9}%.1f,"n_cells":$nCells,"n_vecs":${nCells.toLong * vecsPerCell},"dim":$dim}""")

    val queries = (0 until nQueries).map { q =>
      (q.toLong, h(q.toLong, 17L, nCells.toLong) * vecsPerCell)
    }
    def run(label: String, floor: String): Unit = {
      spark.conf.set("spark.graft.serve.groupFloor", floor)
      try {
        val t = System.nanoTime()
        val stats = graft.operators.ExactIvf
          .pruneStats(spark, path, queries, k, nprobe0).collect()
        val statsSec = (System.nanoTime() - t) / 1e9
        val boundRows = stats.map(_.getLong(3)).sum
        val survivors = stats.map(_.getLong(2)).sum
        val t2 = System.nanoTime()
        val served = graft.operators.ExactIvf
          .topDotBatchFromStore(spark, path, queries, k, nprobe0).count()
        val serveSec = (System.nanoTime() - t2) / 1e9
        println(f"""{"mode":"$label","bound_rows":$boundRows,"survivor_pairs":$survivors,"stats_sec":$statsSec%.1f,"serve_rows":$served,"serve_sec":$serveSec%.1f}""")
      } finally spark.conf.unset("spark.graft.serve.groupFloor")
    }
    // grouped first, then the flat twin (floor in integer ops)
    run("grouped", floor = "1")
    run("flat", floor = Long.MaxValue.toString)

    // the IVFADC twin: same synthetic corpus, same geometry — the
    // probe→cell selection's |probes|·nCells term measured grouped vs
    // flat (the serve tail past the selection is identical)
    val adcPath = java.nio.file.Files
      .createTempDirectory("graft-groupbound-adc-").toString
    val t1 = System.nanoTime()
    graft.operators.Pq.writeIvfadcStoreAssigned(spark,
      assigned, cents, adcPath, m = 4, dim = dim, nCents = 64, iters = 1)
    println(f"""{"adc_build_sec":${(System.nanoTime() - t1) / 1e9}%.1f}""")
    // the serve micro-lifts probe embeddings by 1e6 — hand it the
    // double form that round-trips to the store's micro-space vm
    val emb = assigned.select(col("vec_id"),
      transform(col("vm"), x => x.cast("double") / 1e6).as("embedding"))
    val probeIds = queries.map(_._2)
    def runAdc(label: String, floor: String): Unit = {
      spark.conf.set("spark.graft.serve.groupFloor", floor)
      try {
        val t = System.nanoTime()
        val served = graft.operators.Pq.ivfadcTopKFromStore(spark,
          adcPath, emb, probeIds, nprobe = 4, kShort = 50, k = 10,
          m = 4, dim = dim).count()
        println(f"""{"adc_mode":"$label","serve_rows":$served,"serve_sec":${(System.nanoTime() - t) / 1e9}%.1f}""")
      } finally spark.conf.unset("spark.graft.serve.groupFloor")
    }
    runAdc("grouped", floor = "1")
    runAdc("flat", floor = Long.MaxValue.toString)
    spark.stop()
  }
}
