package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables._
import graft.functions.EmaAggregator

/** The custom-Aggregator EMA (UDAF path) run as a graded query — shares
  * q13's oracle SQL, proving the sequential-fold aggregator and the
  * closed-form window formulation agree with the DuckDB replay. */
object AggregatorQueries {

  val x14 = Query(
    "x14_ema_aggregator",
    EventQueries.q13.sql // same contract as the closed form
  ) { (s, d) =>
    import s.implicits._
    val obs = events(s, d).select(
      col("user_id"),
      unix_micros(col("ts")).as("ts"),
      col("event_id").as("id"),
      col("value"))
      .as[(Long, Long, Long, Double)]
      .map { case (uid, ts, id, v) => (uid, EmaAggregator.Obs(ts, id, v)) }
    val emaCol = new EmaAggregator.Ema(0.9).toColumn
    val folded = obs.groupByKey(_._1)
      .mapValues(_._2)
      .agg(emaCol.name("ema_raw"))
      .toDF("user_id", "ema_raw")
    val counts = events(s, d).groupBy("user_id").agg(count(lit(1)).as("n_events"))
    folded.join(counts, "user_id")
      .select(col("user_id"), col("n_events"), round(col("ema_raw"), 6).as("ema"))
      .orderBy("user_id")
  }

  val all: Seq[Query] = Seq(x14)
}
