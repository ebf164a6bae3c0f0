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

  val BinLimit: Int = 4096 // AGENT_DEFAULT_BIN_LIMIT
  val MaxBinWidth: Int = 65535 // per-bin count cap (u16::MAX)

  /** Mutable agent-defaults sketch accumulator — `insert_n` for
    * distribution samples and `insert_interpolate_buckets` for
    * aggregated-histogram buckets, the two legs of
    * AgentDDSketch::transform_to_sketch (ddsketch.rs:796-822) that the
    * datadog_metrics sink's normalizer applies before sketch encoding
    * (sinks/datadog/metrics/normalizer.rs:22-29). Bins keep the
    * agent's invariants: sorted by key, per-bin count capped at
    * u16::MAX with overflow split into repeat bins (generate_bins,
    * ddsketch.rs:994), total bins trimmed from the LEFT at 4096
    * (trim_left, :951); the running min/max/sum/avg update follows
    * adjust_basic_stats (:387) operation-for-operation so lanes are
    * bit-identical to the reference for the same sample order.
    */
  final class Builder {
    private var cnt: Long = 0L
    private var mn: Double = Double.MaxValue
    private var mx: Double = -Double.MaxValue // f64::MIN
    private var sm: Double = 0.0
    private var av: Double = 0.0
    private var bins: Array[(Int, Int)] = Array.empty // (k, n) sorted by k

    def isEmpty: Boolean = cnt == 0
    def count: Long = cnt
    def min: Double = mn
    def max: Double = mx
    def sum: Double = sm
    def avg: Double = av
    def ks: Seq[Long] = bins.map(_._1.toLong).toSeq
    def ns: Seq[Long] = bins.map(_._2.toLong).toSeq

    private def adjustBasicStats(v: Double, n: Long): Unit = {
      if (v < mn) mn = v
      if (v > mx) mx = v
      cnt += n
      sm += v * n.toDouble
      if (n == 1) av += (v - av) / cnt.toDouble
      else av += (v - av) * n.toDouble / cnt.toDouble
    }

    private def generateBins(out: scala.collection.mutable.ArrayBuffer[(Int, Int)],
                             k: Int, n: Long): Unit =
      if (n < MaxBinWidth) out += ((k, n.toInt))
      else {
        val overflow = (n % MaxBinWidth).toInt
        if (overflow != 0) out += ((k, overflow))
        var i = 0L
        while (i < n / MaxBinWidth) { out += ((k, MaxBinWidth)); i += 1 }
      }

    private def trimLeft(b: scala.collection.mutable.ArrayBuffer[(Int, Int)]): Unit = {
      if (b.length < BinLimit) return
      val numToRemove = b.length - BinLimit
      var missing = 0L
      val overflow = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0
      while (i < numToRemove) {
        missing += b(i)._2
        if (missing > MaxBinWidth) {
          overflow += ((b(i)._1, MaxBinWidth))
          missing -= MaxBinWidth
        }
        i += 1
      }
      val (rk, rn) = b(numToRemove)
      val next = missing + rn
      if (next > MaxBinWidth) { b(numToRemove) = (rk, MaxBinWidth); missing = next - MaxBinWidth }
      else { b(numToRemove) = (rk, next.toInt); missing = 0L }
      if (missing > 0) generateBins(overflow, rk, missing)
      val overflowLen = overflow.length
      overflow ++= b.view.slice(numToRemove, b.length)
      val res = overflow.take(BinLimit + overflowLen)
      b.clear()
      b ++= res
    }

    private def insertKeyCounts(counts0: Seq[(Int, Long)]): Unit = {
      val counts = counts0.sortBy(_._1)
      val temp = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var bi = 0
      var ki = 0
      while (bi < bins.length && ki < counts.length) {
        val (bk, bn) = bins(bi)
        val (vk, kn) = counts(ki)
        if (bk > vk) { generateBins(temp, vk, kn); ki += 1 }
        else if (bk < vk) { temp += ((bk, bn)); bi += 1 }
        else { generateBins(temp, bk, bn.toLong + kn); bi += 1; ki += 1 }
      }
      while (bi < bins.length) { temp += bins(bi); bi += 1 }
      while (ki < counts.length) {
        generateBins(temp, counts(ki)._1, counts(ki)._2); ki += 1
      }
      trimLeft(temp)
      bins = temp.toArray
    }

    /** insert_n (ddsketch.rs:549): one distribution sample `value ×
      * rate`.
      *
      * The common case (no per-bin overflow, under the 4096-bin trim
      * threshold) merges in place after a binary search instead of
      * rebuilding the whole bins array per sample — the egress A/B
      * probe measured the rebuild-per-sample form as the dominant cost
      * of the dd sketch egress (64-sample rows paid O(samples × bins)
      * buffer churn). Results are bit-identical to the general path:
      * a single-key insertKeyCounts is exactly "merge into the FIRST
      * bin with this key, else splice at the sorted position", and the
      * fast path bails out whenever generateBins would split
      * (count ≥ u16::MAX) or trimLeft would fire (≥ 4096 bins).
      */
    def insertN(v: Double, n: Long): Unit = if (n > 0) {
      adjustBasicStats(v, n)
      val k = key(v)
      // lower bound: first bin with key >= k (overflow splits repeat a
      // key; the sequential merge touches the first occurrence only)
      var lo = 0
      var hi = bins.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bins(mid)._1 < k) lo = mid + 1 else hi = mid
      }
      if (lo < bins.length && bins(lo)._1 == k) {
        val combined = bins(lo)._2.toLong + n
        if (combined < MaxBinWidth && bins.length < BinLimit) {
          bins(lo) = (k, combined.toInt)
          return
        }
      } else if (n < MaxBinWidth && bins.length + 1 < BinLimit) {
        val next = new Array[(Int, Int)](bins.length + 1)
        System.arraycopy(bins, 0, next, 0, lo)
        next(lo) = (k, n.toInt)
        System.arraycopy(bins, lo, next, lo + 1, bins.length - lo)
        bins = next
        return
      }
      insertKeyCounts(Seq((k, n))) // slow path: overflow split / trim
    }

    /** insert_interpolate_bucket (ddsketch.rs:558): spread one
      * histogram bucket's count across the sketch bins spanning
      * [lower, upper], proportional to each bin's width.
      */
    private def insertInterpolateBucket(lower: Double, upper: Double,
                                        count: Long): Unit = {
      val lowerKey = key(lower)
      val upperKey = key(upper)
      val keys = Array.range(lowerKey, upperKey + 1)
      val kcs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      var remaining = count
      val distance = upper - lower
      var startIdx = 0
      var endIdx = 1
      var lowerBound = binLowerBound(keys(startIdx).toLong)
      var remainder = 0.0
      while (endIdx < keys.length && remaining > 0) {
        val upperBound = binLowerBound(keys(endIdx).toLong)
        val fkn = ((upperBound - lowerBound) / distance) * count.toDouble
        if (fkn > 1.0) remainder += fkn - fkn.longValue.toDouble
        var kn = fkn.toLong // `fkn as u32` truncates toward zero
        if (remainder > 1.0) { kn += 1; remainder -= 1.0 }
        if (kn > 0) {
          if (kn > remaining) kn = remaining
          adjustBasicStats(lowerBound, kn)
          kcs += ((keys(startIdx), kn))
          remaining -= kn
          startIdx = endIdx
          lowerBound = upperBound
        }
        endIdx += 1
      }
      if (remaining > 0) {
        val lastKey = keys(startIdx)
        lowerBound = binLowerBound(lastKey.toLong)
        adjustBasicStats(lowerBound, remaining)
        kcs += ((lastKey, remaining))
      }
      insertKeyCounts(kcs.toSeq)
    }

    /** insert_interpolate_buckets (ddsketch.rs:624): buckets sorted by
      * upper limit; the +Inf bucket collapses onto the previous bound
      * and the leading −Inf lower bound onto the first.
      */
    def insertInterpolateBuckets(buckets0: Seq[(Double, Long)]): Unit = {
      val buckets = buckets0.sortBy(_._1)
      var lower = Double.NegativeInfinity
      buckets.foreach { case (upperLimit, count) =>
        var upper = upperLimit
        if (upper > 0 && upper.isInfinite) upper = lower
        else if (lower < 0 && lower.isInfinite) lower = upper
        insertInterpolateBucket(lower, upper, count)
        lower = upperLimit
      }
    }
  }
}
