package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.Scoring

/** EMA law (SURVEY §5.2): sequential fold ≡ closed form ≡ custom
  * Aggregator, for the same ordered observations. */
class EmaSpec extends AnyFunSuite with SparkTest {

  private val alpha = 0.9

  private def scalaFold(xs: Seq[Double]): Double =
    xs.tail.foldLeft(xs.head)((s, x) => alpha * s + (1 - alpha) * x)

  test("closed form matches the sequential fold per key") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = for (uid <- 0L until 10L; i <- 0 until 40)
      yield (uid, i.toLong, rnd.nextDouble() * 100)
    val df = rows.toDF("user_id", "seq", "value")
    val closed = Scoring.emaClosedForm(df, "user_id", "value", alpha, col("seq"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expected = rows.groupBy(_._1).map { case (uid, g) =>
      uid -> scalaFold(g.sortBy(_._2).map(_._3))
    }
    expected.foreach { case (uid, e) =>
      assert(math.abs(closed(uid) - (math.rint(e * 1e6) / 1e6)) < 2e-6,
        s"uid=$uid closed=${closed(uid)} fold=$e")
    }
  }

  test("seeded closed form matches a fold seeded at 1.0 (reference init)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for (uid <- 0L until 8L; i <- 0 until 30)
      yield (uid, i.toLong, rnd.nextDouble())
    val df = rows.toDF("user_id", "seq", "value")
    val closed = Scoring.emaClosedFormSeeded(df, "user_id", "value", alpha, 1.0, col("seq"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.groupBy(_._1).foreach { case (uid, g) =>
      // the reference fold: s starts at 1.0 and EVERY observation folds in
      // (/root/reference/neurons/validator.py:110,146)
      val e = g.sortBy(_._2).map(_._3)
        .foldLeft(1.0)((s, x) => alpha * s + (1 - alpha) * x)
      assert(math.abs(closed(uid) - (math.rint(e * 1e6) / 1e6)) < 2e-6,
        s"uid=$uid closed=${closed(uid)} fold=$e")
    }
  }

  test("custom Aggregator matches the sequential fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = for (uid <- 0L until 6L; i <- 0 until 25)
      yield (uid, EmaAggregator.Obs(1000L + i, i.toLong, rnd.nextDouble() * 10))
    val agged = rows.toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(new EmaAggregator.Ema(alpha).toColumn.name("ema"))
      .collect().toMap
    rows.groupBy(_._1).foreach { case (uid, g) =>
      val e = scalaFold(g.sortBy(o => (o._2.ts, o._2.id)).map(_._2.value))
      assert(math.abs(agged(uid) - e) < 1e-9, s"uid=$uid")
    }
  }

  test("aggregator is merge-order independent (repartitioned input)") {
    import spark.implicits._
    val rows = (0 until 60).map(i => EmaAggregator.Obs(i.toLong, i.toLong, (i % 7).toDouble))
    val ds = rows.toDS().repartition(7)
    val one = ds.map(o => (0L, o)).groupByKey(_._1).mapValues(_._2)
      .agg(new EmaAggregator.Ema(alpha).toColumn.name("ema")).collect().head._2
    assert(math.abs(one - scalaFold(rows.map(_.value))) < 1e-9)
  }
}
