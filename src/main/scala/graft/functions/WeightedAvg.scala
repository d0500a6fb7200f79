package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

final case class WAvgBuf(sum: Double, wsum: Double)

/** Custom typed aggregate (SURVEY.md §2.5 UDF/UDAF extension point):
  * weight-averaged value via `Aggregator`, registered untyped with
  * `functions.udaf` so it runs inside codegen'd hash aggregation with a
  * mergeable buffer — the extension pattern for sketches/HLL-style
  * aggregates at scale (partial aggregation on the map side works because
  * `merge` is associative).
  */
object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
  override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
  override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf =
    WAvgBuf(b.sum + in._1 * in._2, b.wsum + in._2)
  override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
    WAvgBuf(a.sum + b.sum, a.wsum + b.wsum)
  override def finish(b: WAvgBuf): Double =
    if (b.wsum == 0.0) 0.0 else b.sum / b.wsum
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
