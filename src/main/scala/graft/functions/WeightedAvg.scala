package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact-decimal weighted average: Σ(price·qty) / Σ(qty), both sides
  * accumulated as exact decimals (order-independent ⇒ deterministic
  * under partition-parallel merge), divided as doubles at the end —
  * bit-matching the DuckDB oracle's decimal-sum formulation.
  *
  * UDAF surface (SURVEY.md §2B q_udaf): the typed
  * Aggregator[IN, BUF, OUT] analog of the reference's TER×weight
  * catalog statistics.
  */
case class WAvgBuf(sumPq: BigDecimal, sumQ: BigDecimal)

class WeightedAvg extends Aggregator[(Double, Double, String), WAvgBuf, Double] {
  private def d2(x: Double): BigDecimal =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
  override def zero: WAvgBuf = WAvgBuf(BigDecimal(0), BigDecimal(0))
  override def reduce(b: WAvgBuf, a: (Double, Double, String)): WAvgBuf =
    WAvgBuf(b.sumPq + d2(a._1) * d2(a._2), b.sumQ + d2(a._2))
  override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf =
    WAvgBuf(x.sumPq + y.sumPq, x.sumQ + y.sumQ)
  override def finish(b: WAvgBuf): Double =
    if (b.sumQ == 0) 0.0 else b.sumPq.toDouble / b.sumQ.toDouble
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
