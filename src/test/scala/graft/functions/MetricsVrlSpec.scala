package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The internal-metrics VRL functions (reference lib/vector-vrl/metrics:
  * get_vector_metric / find_vector_metrics / aggregate_vector_metrics).
  * Resolved against a compile-time snapshot of the internal registry —
  * these tests seed the registry, compile, and check the literals.
  */
class MetricsVrlSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq((1L, "a")).toDF("id", "etype")

  // the registry is a process-global that ACCUMULATES on counter();
  // seed exactly once per suite
  private lazy val seeded: Boolean = {
    val reg = graft.streaming.InternalObs.registry
    reg.counter("vrlm_events_total",
      Map("component_id" -> "parse_live", "component_kind" -> "source"), 40.0)
    reg.counter("vrlm_events_total",
      Map("component_id" -> "parse_dead", "component_kind" -> "source"), 2.0)
    reg.gauge("vrlm_utilization", Map("component_id" -> "parse_live"), 0.5)
    true
  }

  test("get_vector_metric returns the first match with its value") {
    assert(seeded)
    val out = VrlCompiler.run(events,
      """.m = get_vector_metric("vrlm_utilization")
        |.v = .m.value
        |.t = .m.type
        |""".stripMargin)
    val r = out.primary.head()
    assert(r.getAs[Double]("v") == 0.5)
    assert(r.getAs[String]("t") == "gauge")
    // no match -> null object
    val none = VrlCompiler.run(events,
      """.m = get_vector_metric("vrlm_no_such")""").primary.head()
    assert(none.getAs[Row]("m") == null)
  }

  test("find_vector_metrics filters by tag with wildcards") {
    assert(seeded)
    val out = VrlCompiler.run(events,
      """.all = find_vector_metrics("vrlm_events_total")
        |.live = find_vector_metrics("vrlm_events_total",
        |  tags: {"component_id": "*_live"})
        |.n_all = length(.all)
        |.n_live = length(.live)
        |""".stripMargin)
    val r = out.primary.head()
    assert(r.getAs[Long]("n_all") == 2L)
    assert(r.getAs[Long]("n_live") == 1L)
  }

  test("aggregate_vector_metrics sums/averages counter values") {
    assert(seeded)
    val out = VrlCompiler.run(events,
      """.s = aggregate_vector_metrics("sum", "vrlm_events_total")
        |.a = aggregate_vector_metrics("avg", "vrlm_events_total")
        |.mx = aggregate_vector_metrics("max", "vrlm_events_total")
        |.none = aggregate_vector_metrics("max", "vrlm_no_such")
        |""".stripMargin)
    val r = out.primary.head()
    assert(r.getAs[Double]("s") == 42.0)
    assert(r.getAs[Double]("a") == 21.0)
    assert(r.getAs[Double]("mx") == 40.0)
    assert(r.isNullAt(r.fieldIndex("none")))
  }

  test("non-literal key is rejected at compile time") {
    intercept[VrlCompiler.VrlCompileException] {
      VrlCompiler.run(events, """.m = get_vector_metric(.etype)""")
    }
  }
}
