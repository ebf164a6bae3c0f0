package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** The agent DDSketch quantile math vs the public vector-core
  * ddsketch.rs semantics (γ = 1 + 1/64, bias from min 1e-9,
  * round-half-even rank, in-bin linear interpolation, clamp).
  */
class AgentSketchSpec extends AnyFunSuite {

  test("constants mirror the agent defaults") {
    assert(AgentSketch.GammaV == 1.015625) // 1 + 2·(1/128)
    assert(AgentSketch.NormMin <= 1.0e-9)
    assert(AgentSketch.binLowerBound(0) == 0.0)
    assert(AgentSketch.binLowerBound(Short.MaxValue.toLong)
      == Double.PositiveInfinity)
    assert(AgentSketch.binLowerBound(-5) == -AgentSketch.binLowerBound(5))
  }

  test("key/bin invariant: v sits inside its bin up to rounding") {
    Seq(1e-6, 0.5, 1.0, 3.0, 42.0, 1e6).foreach { v =>
      val k = AgentSketch.key(v)
      val lower = AgentSketch.binLowerBound(k.toLong)
      // round-to-even key → v within one γ of the bin lower bound
      assert(lower / AgentSketch.GammaV <= v && v <= lower * AgentSketch.GammaV,
        s"v=$v k=$k lower=$lower")
    }
    assert(AgentSketch.key(0.0) == 0)
    assert(AgentSketch.key(-3.0) == -AgentSketch.key(3.0))
  }

  test("quantile: edges, clamp, monotonicity, interpolation") {
    // two bins: 2 samples near 1.0, 2 samples near 3.0
    val k1 = AgentSketch.key(1.0).toLong
    val k3 = AgentSketch.key(3.0).toLong
    val ks = Seq(k1, k3)
    val ns = Seq(2L, 2L)
    def q(p: Double) =
      AgentSketch.quantile(ks, ns, 4L, 1.0, 3.0, p).get
    assert(q(0.0) == 1.0 && q(1.0) == 3.0) // q<=0 -> min, q>=1 -> max
    // rank(0.5) = rint(1.5) = 2 (half to even) -> lands in the second
    // bin with weight 1 -> its lower bound, inside [3/γ, 3]
    assert(q(0.5) >= 3.0 / AgentSketch.GammaV && q(0.5) <= 3.0)
    // monotone and clamped
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99).map(q)
    assert(qs == qs.sorted)
    assert(qs.forall(v => v >= 1.0 && v <= 3.0))
    // empty sketch -> None
    assert(AgentSketch.quantile(Nil, Nil, 0L, 0, 0, 0.5).isEmpty)
  }

  test("Builder.insertN: adjust_basic_stats order-for-order") {
    val b = new AgentSketch.Builder
    assert(b.isEmpty)
    b.insertN(1.0, 2)
    b.insertN(3.0, 3)
    b.insertN(5.0, 1)
    assert(b.count == 6 && b.min == 1.0 && b.max == 5.0)
    assert(b.sum == 1.0 * 2 + 3.0 * 3 + 5.0 * 1)
    // the running weighted average, same operation order as
    // ddsketch.rs:387-406 (NOT sum/count)
    val a1 = 0.0 + (1.0 - 0.0) * 2.0 / 2.0
    val a2 = a1 + (3.0 - a1) * 3.0 / 5.0
    val a3 = a2 + (5.0 - a2) * 1.0 / 6.0
    assert(b.avg == a3)
    assert(b.ks == Seq(AgentSketch.key(1.0).toLong,
      AgentSketch.key(3.0).toLong, AgentSketch.key(5.0).toLong))
    assert(b.ns == Seq(2L, 3L, 1L))
    // the built lanes feed the quantile walker coherently
    val q = AgentSketch.quantile(b.ks, b.ns, b.count, b.min, b.max, 0.5)
    assert(q.exists(v => v >= 3.0 / AgentSketch.GammaV
      && v <= 3.0 * AgentSketch.GammaV))
  }

  test("Builder: u16 per-bin cap splits, 4096-bin budget trims left") {
    val b = new AgentSketch.Builder
    b.insertN(2.0, 200000L) // 3×65535 + 3395 → four bins, one key
    assert(b.ks.distinct == Seq(AgentSketch.key(2.0).toLong))
    assert(b.ns.sum == 200000L && b.ns.forall(_ <= 65535L))
    // blow past the bin budget with 4200 distinct ascending keys:
    // trim_left drops the SMALLEST keys, folding their counts right,
    // so the total count survives at exactly bin_limit bins
    val b2 = new AgentSketch.Builder
    var i = 0
    while (i < 4200) {
      b2.insertN(AgentSketch.binLowerBound((100 + i).toLong)
        * (1.0 + 1e-7), 1L)
      i += 1
    }
    assert(b2.ks.length == AgentSketch.BinLimit)
    assert(b2.count == 4200L && b2.ns.sum == 4200L)
    assert(b2.ks == b2.ks.sorted)
  }

  test("Builder.insertInterpolateBuckets: counts spread, stats at bin bounds") {
    // prometheus-style buckets (1.0: 4, 2.0: 2, +Inf: 1):
    // the first bucket collapses its -inf lower bound onto 1.0, the
    // +Inf bucket onto the previous bound (ddsketch.rs:624-668)
    val b = new AgentSketch.Builder
    b.insertInterpolateBuckets(Seq((1.0, 4L), (2.0, 2L),
      (Double.PositiveInfinity, 1L)))
    assert(b.count == 7L && b.ns.sum == 7L)
    val k1 = AgentSketch.key(1.0)
    val k2 = AgentSketch.key(2.0)
    assert(b.ks.forall(k => k >= k1 && k <= k2))
    assert(b.ks == b.ks.sorted && b.ks.distinct == b.ks)
    // stats were adjusted at bin lower bounds, not raw values
    assert(b.min == AgentSketch.binLowerBound(k1.toLong))
    assert(b.max == AgentSketch.binLowerBound(k2.toLong))
  }
}
