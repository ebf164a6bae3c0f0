package graft.model

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** DDSketch-style mergeable quantile sketch.
  *
  * Reference: `MetricValue::Sketch(AgentDDSketch)` —
  * /root/reference/lib/vector-core/src/event/metric/value.rs:77-87 — the
  * reference's only quantile structure, a log-bucketed sketch with
  * relative-error guarantee (public DDSketch paper: Masson, Rim, Lee,
  * VLDB 2019). Bucket index of x is ceil(log_gamma(x)); the bucket's
  * representative value 2*gamma^i/(gamma+1) is within (gamma-1)/(gamma+1)
  * relative error of any member.
  *
  * Implemented as a typed Spark `Aggregator` (partial aggregation +
  * merge across partitions come from the agg framework — the sketch IS
  * mergeable state), registered for DataFrame use via `udaf`. Every
  * operation is deterministic, so a SQL oracle can recompute the exact
  * bucket layout — see the metric_sketch query.
  */
final case class SketchBucket(idx: Int, cnt: Long)
final case class SketchBuf(counts: Map[Int, Long], zero: Long, total: Long)
final case class SketchOut(total: Long, zero: Long, buckets: Seq[SketchBucket])

class DDSketchAgg(gamma: Double, minValue: Double)
  extends Aggregator[Double, SketchBuf, SketchOut] {

  private val logG = math.log(gamma)

  override def zero: SketchBuf = SketchBuf(Map.empty, 0L, 0L)

  override def reduce(b: SketchBuf, x: Double): SketchBuf =
    if (x <= minValue) b.copy(zero = b.zero + 1, total = b.total + 1)
    else {
      val i = math.ceil(math.log(x) / logG).toInt
      b.copy(counts = b.counts + (i -> (b.counts.getOrElse(i, 0L) + 1L)),
        total = b.total + 1)
    }

  override def merge(a: SketchBuf, b: SketchBuf): SketchBuf =
    SketchBuf(
      (a.counts.keySet ++ b.counts.keySet).map(i =>
        i -> (a.counts.getOrElse(i, 0L) + b.counts.getOrElse(i, 0L))).toMap,
      a.zero + b.zero, a.total + b.total)

  override def finish(b: SketchBuf): SketchOut =
    SketchOut(b.total, b.zero,
      b.counts.toSeq.sortBy(_._1).map { case (i, c) => SketchBucket(i, c) })

  override def bufferEncoder: Encoder[SketchBuf] = Encoders.product[SketchBuf]
  override def outputEncoder: Encoder[SketchOut] = Encoders.product[SketchOut]
}

object DDSketch {

  val DefaultGamma = 1.02

  /** The sketch as an untyped aggregate column function. */
  def agg(gamma: Double = DefaultGamma, minValue: Double = 1e-9)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new DDSketchAgg(gamma, minValue))

  /** Bucket index holding quantile q — null when the zero bucket holds it
    * (rank falls inside the zero count). Pure Column walk over the sorted
    * bucket array.
    */
  def quantileIdx(sketch: Column, q: Double): Column = {
    val rank = greatest(lit(1L), ceil(lit(q) * sketch.getField("total")))
    val adjRank = rank - sketch.getField("zero")
    val walk = aggregate(
      sketch.getField("buckets"),
      struct(lit(0L).as("cum"), lit(null).cast("int").as("idx")),
      (acc, b) => struct(
        (acc.getField("cum") + b.getField("cnt")).as("cum"),
        coalesce(acc.getField("idx"),
          when(acc.getField("cum") + b.getField("cnt") >= adjRank,
            b.getField("idx"))).as("idx")))
    when(adjRank <= 0, lit(null).cast("int")).otherwise(walk.getField("idx"))
  }

  /** Representative value of quantile q: 0 for the zero bucket, else
    * 2*gamma^i/(gamma+1) (rounded coarsely — pow() may differ by ulps
    * across engines).
    */
  def quantileValue(sketch: Column, q: Double,
                    gamma: Double = DefaultGamma): Column = {
    val idx = quantileIdx(sketch, q)
    when(idx.isNull, 0.0)
      .otherwise(round(lit(2.0) * pow(lit(gamma), idx) / (gamma + 1), 3))
  }

  /** Relative-error bound of the sketch: (gamma-1)/(gamma+1). */
  def relativeError(gamma: Double = DefaultGamma): Double =
    (gamma - 1) / (gamma + 1)
}
