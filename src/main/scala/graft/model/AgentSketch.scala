package graft.model

/** The Datadog agent DDSketch's quantile math — reference
  * lib/vector-core/src/metrics/ddsketch.rs (public in-tree source):
  * agent defaults eps=1/128 (doubled by Config::new → γ = 1 + 1/64),
  * min_value 1e-9, bias = −⌊ln(min)/ln γ⌋ + 1; bin k's lower bound is
  * sign(k) · γ^(|k|−bias) (0 → 0, ±MAX_KEY → ±∞); quantile(q) walks
  * the (k, n) bins to rank = round-half-even(q·(count−1)) and linearly
  * interpolates inside the covering bin (ddsketch.rs:680-716), clamped
  * to [min, max]. This is what turns the datadog_agent intake's raw
  * sketch lanes into servable percentile columns (greptimedb_metrics'
  * encode_sketch, request_builder.rs:188-215).
  */
object AgentSketch {

  val Eps: Double = 2.0 * (1.0 / 128.0) // Config::new doubles 1/128
  val GammaV: Double = 1.0 + Eps
  val GammaLn: Double = math.log1p(Eps)
  val MinValue: Double = 1.0e-9
  val NormBias: Int =
    -math.floor(math.log(MinValue) / GammaLn).toInt + 1
  val MaxKey: Int = Short.MaxValue
  /** norm_min = lower_bound(1) — the smallest representable positive. */
  val NormMin: Double = math.pow(GammaV, (1 - NormBias).toDouble)

  /** lower_bound(ddsketch.rs:39-53). */
  def binLowerBound(k: Long): Double =
    if (k < 0) -binLowerBound(-k)
    else if (k >= MaxKey) Double.PositiveInfinity
    else if (k == 0) 0.0
    else math.pow(GammaV, (k - NormBias).toDouble)

  /** quantile (ddsketch.rs:680-716): bins arrive in the agent's sorted
    * order, rank = round-half-even(q·(count−1)) (rank(), :931).
    */
  def quantile(ks: Seq[Long], ns: Seq[Long], count: Long,
               min: Double, max: Double, q: Double): Option[Double] = {
    if (count == 0) None
    else if (q <= 0.0) Some(min)
    else if (q >= 1.0) Some(max)
    else {
      val wanted = math.rint(q * (count - 1).toDouble)
      var acc = 0.0
      var i = 0
      var est = Double.NaN
      var found = false
      while (i < ks.length && !found) {
        acc += ns(i).toDouble
        if (acc > wanted) {
          val weight = (acc - wanted) / ns(i).toDouble
          var vLow = binLowerBound(ks(i))
          val vHigh = vLow * GammaV
          if (i == 0) vLow = min
          est = vLow * weight + vHigh * (1.0 - weight)
          found = true
        }
        i += 1
      }
      if (!found) Some(Double.NaN)
      else Some(math.max(min, math.min(max, est)))
    }
  }

  /** key(v) (ddsketch.rs Config::key) — which bin a value lands in;
    * used by specs to build valid lanes.
    */
  def key(v: Double): Int = {
    if (v < 0) return -key(-v)
    if (v == 0.0 || (v > 0.0 && v < NormMin)) return 0
    val rounded = math.rint(math.log(v) / GammaLn)
    math.min(math.max(rounded.toInt + NormBias, 1), MaxKey)
  }
}
