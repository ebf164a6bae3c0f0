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
}
