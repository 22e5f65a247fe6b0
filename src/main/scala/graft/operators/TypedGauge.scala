package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.streaming.GaugePoint

/** Typed `Aggregator` form of the latest-value gauge — the Dataset-API
  * counterpart of `Firehose.gaugeLatest`'s `max_by`. Same semantics (latest
  * by (timestamp, id) per series), expressed as a custom merge-able
  * aggregation buffer: Catalyst plans it with partial aggregation exactly
  * like the built-in, so the shuffle still carries one buffer per series
  * per input partition.
  */
object TypedGauge {

  case class LatestState(ts: Long, id: String, value: Double, set: Boolean)

  object LatestValueAgg extends Aggregator[GaugePoint, LatestState, Double] {
    override def zero: LatestState = LatestState(Long.MinValue, "", 0.0, set = false)

    private def later(aTs: Long, aId: String, bTs: Long, bId: String): Boolean =
      aTs > bTs || (aTs == bTs && aId > bId)

    override def reduce(b: LatestState, p: GaugePoint): LatestState =
      if (!b.set || later(p.timestamp, p.id, b.ts, b.id))
        LatestState(p.timestamp, p.id, p.value, set = true)
      else b

    override def merge(a: LatestState, b: LatestState): LatestState =
      if (!a.set) b
      else if (!b.set) a
      else if (later(a.ts, a.id, b.ts, b.id)) a
      else b

    override def finish(r: LatestState): Double = r.value
    override def bufferEncoder: Encoder[LatestState] = Encoders.product[LatestState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** ((component, name, series), last_value) per live series. */
  def gaugeLatest(points: Dataset[GaugePoint]): Dataset[((String, String, String), Double)] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(p => (p.component, p.name, p.series))
      .agg(LatestValueAgg.toColumn.name("last_value"))
  }
}
