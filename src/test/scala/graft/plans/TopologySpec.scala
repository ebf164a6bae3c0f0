package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.Topology.{Sink, Source, Transform}

class TopologySpec extends SparkSpec {
  import spark.implicits._

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
}
