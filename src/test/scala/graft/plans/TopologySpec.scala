package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.Topology.{Sink, Source, Transform}

class TopologySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def src(id: String, t: Topology.DataType = Topology.Log) =
    Source(id, t, sp => { import sp.implicits._; Seq((1, "a"), (2, "b")).toDF("id", "v") })

  test("fan-in unions multiple inputs by name") {
    val built = Topology.build(spark, Seq(
      src("s1"), src("s2"),
      Sink("out", Seq("s1", "s2"), Topology.Any)))
    assert(built.sink("out").count() == 4)
  }

  test("multi-output ports route to distinct consumers") {
    val built = Topology.build(spark, Seq(
      src("s"),
      Transform("split", Seq("s"), Topology.Any, Topology.Any, df => Map(
        "odd" -> df.filter(col("id") % 2 === 1),
        "even" -> df.filter(col("id") % 2 === 0))),
      Sink("odds", Seq("split.odd"), Topology.Any),
      Sink("evens", Seq("split.even"), Topology.Any)))
    assert(built.sink("odds").select("id").as[Int].collect().toSeq == Seq(1))
    assert(built.sink("evens").select("id").as[Int].collect().toSeq == Seq(2))
  }

  test("cycle detection rejects self-referential graphs") {
    val ex = intercept[IllegalArgumentException] {
      Topology.build(spark, Seq(
        src("s"),
        Transform.simple("a", Seq("s", "b"), identity),
        Transform.simple("b", Seq("a"), identity),
        Sink("out", Seq("b"), Topology.Any)))
    }
    assert(ex.getMessage.contains("cycle"))
  }

  test("typecheck rejects log->metric edges") {
    val ex = intercept[IllegalArgumentException] {
      Topology.build(spark, Seq(
        src("logs", Topology.Log),
        Sink("metrics_out", Seq("logs"), Topology.Metric)))
    }
    assert(ex.getMessage.contains("type mismatch"))
  }

  test("the same topology wiring runs over streaming sources") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Int]
    mem.addData(1 to 10: _*)
    val built = Topology.build(spark, Seq(
      Source("nums", Topology.Log, _ => mem.toDF()),
      Transform.simple("double", Seq("nums"),
        df => df.withColumn("v", col("value") * 2)),
      Sink("out", Seq("double"), Topology.Any)))
    val q = built.sink("out").writeStream
      .format("memory").queryName("topo_stream")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000); q.stop()
    assert(spark.table("topo_stream").agg(sum(col("v"))).head().getLong(0) == 110L)
  }

  test("unknown input refs are rejected") {
    val ex = intercept[IllegalArgumentException] {
      Topology.build(spark, Seq(
        src("s"), Sink("out", Seq("nope"), Topology.Any)))
    }
    assert(ex.getMessage.contains("unknown input"))
  }

  test("wildcard inputs glob-expand at compile (compiler.rs semantics)") {
    // mirrors the reference's compiler.rs glob_expansion test: sources
    // foo1/foo2/bar, transform foos <- foo*, sinks baz <- [foos*, b*],
    // quix <- [*oo*], quux <- [*]
    def inputsOf(cs: Seq[Topology.Component], id: String): Seq[String] =
      Topology.expandGlobInputs(cs).collectFirst {
        case t: Transform if t.id == id => t.inputs
        case s: Sink if s.id == id => s.inputs
      }.get
    val comps = Seq[Topology.Component](
      src("foo1"), src("foo2"), src("bar"),
      Transform.simple("foos", Seq("foo*"), identity),
      Sink("baz", Seq("foos*", "b*"), Topology.Any),
      Sink("quix", Seq("*oo*"), Topology.Any),
      Sink("quux", Seq("*"), Topology.Any))
    assert(inputsOf(comps, "foos") == Seq("foo1", "foo2"))
    // baz: foos* -> foos; b* -> bar (baz itself excluded: not a candidate)
    assert(inputsOf(comps, "baz") == Seq("foos", "bar"))
    assert(inputsOf(comps, "quix") == Seq("foo1", "foo2", "foos"))
    assert(inputsOf(comps, "quux") == Seq("foo1", "foo2", "bar", "foos"))
  }

  test("glob expansion: self-exclusion, no-match fallback, ? and [ ]") {
    // a transform whose pattern matches its own id must not self-loop
    val built = Topology.build(spark, Seq(
      src("app_a"), src("app_b"),
      Transform.simple("app_all", Seq("app_*"),
        _.withColumn("t", lit(1))),
      Sink("out", Seq("app_all"), Topology.Any)))
    assert(built.sink("out").count() == 4) // app_a + app_b unioned
    // ? and [ ] classes expand too
    val q = Topology.build(spark, Seq(
      src("s1"), src("s2"), src("t3"),
      Sink("out", Seq("s?", "[t]3"), Topology.Any)))
    assert(q.sink("out").count() == 6)
    // a glob matching NOTHING stays as-is -> accurate unknown-input error
    val ex = intercept[IllegalArgumentException] {
      Topology.build(spark, Seq(
        src("s"), Sink("out", Seq("zzz_*"), Topology.Any)))
    }
    assert(ex.getMessage.contains("unknown input 'zzz_*'"))
    // … unless wildcard_matching is RELAXED (global_options.rs): the
    // unmatched glob silently contributes nothing
    val relaxed = Topology.build(spark, Seq(
      src("s"), Sink("out", Seq("s", "zzz_*"), Topology.Any)),
      relaxedWildcards = true)
    assert(relaxed.sink("out").count() == 2)
    // a NON-glob unknown ref still errors even in relaxed mode
    val ex2 = intercept[IllegalArgumentException] {
      Topology.build(spark, Seq(
        src("s"), Sink("out", Seq("nope"), Topology.Any)),
        relaxedWildcards = true)
    }
    assert(ex2.getMessage.contains("unknown input 'nope'"))
  }

  test("yaml surface: a sink collects service_* routes via glob") {
    val built = ConfigLoader.load(spark,
      """
        |sources:
        |  ev:
        |    type: parquet
        |    table: events
        |transforms:
        |  service_err:
        |    type: filter
        |    inputs: [ev]
        |    condition: '.event_type == "error"'
        |  service_buy:
        |    type: filter
        |    inputs: [ev]
        |    condition: '.event_type == "purchase"'
        |sinks:
        |  collect:
        |    type: parquet
        |    inputs: ["service_*"]
        |""".stripMargin, sf)
    val got = built.sink("collect").count()
    val want = graft.Graft.table(spark, sf, "events")
      .filter(col("event_type").isin("error", "purchase")).count()
    assert(got == want && got > 0)
  }
}
