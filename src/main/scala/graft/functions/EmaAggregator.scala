package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Order-sensitive EMA as a custom `Aggregator[IN, BUF, OUT]` — the UDAF
  * extension path (SURVEY §4 item 2; reference semantics
  * /root/reference/neurons/validator.py:109-110,146, α=0.9).
  *
  * EMA is a sequential fold: s₁ = x₁, sₖ = α·sₖ₋₁ + (1-α)·xₖ. Stock
  * aggregates are order-agnostic, so the buffer collects (ts, id, value)
  * triples and `finish` sorts + folds. This is O(group) memory — correct
  * and shuffle-friendly for bounded key cardinality (the reference's uid
  * space is ≤256). For unbounded streams use
  * `graft.streaming.ValidatorLoop` (true incremental state); for huge
  * batch groups use the closed form (`Scoring.emaClosedForm`), which this
  * aggregator is property-tested against.
  */
object EmaAggregator {
  /** One observation: event-time micros, tie-break id, value. */
  final case class Obs(ts: Long, id: Long, value: Double)

  final class Ema(alpha: Double) extends Aggregator[Obs, Vector[Obs], Double] {
    override def zero: Vector[Obs] = Vector.empty
    override def reduce(b: Vector[Obs], a: Obs): Vector[Obs] = b :+ a
    override def merge(b1: Vector[Obs], b2: Vector[Obs]): Vector[Obs] = b1 ++ b2
    override def finish(b: Vector[Obs]): Double = {
      val sorted = b.sortBy(o => (o.ts, o.id))
      sorted.headOption.fold(0.0)(h =>
        sorted.tail.foldLeft(h.value)((s, o) => alpha * s + (1 - alpha) * o.value))
    }
    override def bufferEncoder: Encoder[Vector[Obs]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
