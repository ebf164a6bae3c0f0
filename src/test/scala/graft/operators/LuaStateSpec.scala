package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Per-partition VM state + init/shutdown hooks for the lua transform
  * (v2/mod.rs: one VM per transform, globals persist across events,
  * shutdown flushes buffered state).
  */
class LuaStateSpec extends SparkSpec {
  import spark.implicits._

  test("globals persist across events within a partition; shutdown flushes") {
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L))
      .toDF("message", "__seq")
      .withColumn("__event_kind", lit("log"))
      .coalesce(1) // one partition = one VM, deterministic count
    val out = Lua(df, "2",
      source =
        """count = 0
          |function proc(event, emit)
          |  count = count + 1
          |  event.log.n = count
          |  emit(event)
          |end
          |function fin(emit)
          |  emit({ log = { message = "total", n = count } })
          |end
          |""".stripMargin,
      processHook = Some("proc"),
      shutdownHook = Some("fin"))
    val rows = out.select($"message", $"n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "total" -> 3L))
  }

  test("init hook emits before the first event") {
    val df = Seq(("x", 1L)).toDF("message", "__seq")
      .withColumn("__event_kind", lit("log")).coalesce(1)
    val out = Lua(df, "2",
      source = "",
      processHook = Some("function (event, emit) emit(event) end"),
      initHook = Some("""function (emit)
        emit({ log = { message = "hello" } })
      end"""))
    val msgs = out.select($"message").as[String].collect().toSet
    assert(msgs == Set("hello", "x"))
  }

  test("v1 globals persist across events (one Lua state, v1/mod.rs)") {
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("message", "__seq")
      .withColumn("__event_kind", lit("log")).coalesce(1)
    val out = Lua(df, "1",
      source =
        """counter = (counter or 0) + 1
          |event["n"] = counter
          |""".stripMargin,
      processHook = None)
    val rows = out.orderBy($"__seq").collect()
      .map(r => (r.getAs[String]("message"), r.getAs[Long]("n"))).toSeq
    assert(rows == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("scripts see event.timestamp (ISO string) and the type round-trips") {
    // the reference exposes the event's timestamp to Lua; a script
    // conditioning on it must not read nil, and an untouched timestamp
    // keeps its TimestampType after the transform
    val df = Seq(("a", java.sql.Timestamp.valueOf("2024-03-01 10:00:00")))
      .toDF("message", "timestamp")
      .withColumn("__event_kind", lit("log")).coalesce(1)
    val out = Lua(df, "1",
      source =
        """if event.timestamp == nil then
          |  event.had_ts = "missing"
          |else
          |  event.had_ts = "present"
          |end
          |""".stripMargin, processHook = None)
    val r = out.select($"had_ts", $"timestamp").head()
    assert(r.getString(0) == "present")
    assert(r.get(1).isInstanceOf[java.sql.Timestamp])
    assert(r.getTimestamp(1).toInstant ==
      java.time.Instant.parse("2024-03-01T10:00:00Z"))
  }

  test("a streaming input fails at config load with a clear message") {
    implicit val sq = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val err = intercept[IllegalArgumentException] {
      Lua(mem.toDF().withColumnRenamed("value", "message"), "1",
        source = "event.x = 1", processHook = None)
    }
    assert(err.getMessage.contains("streaming sources are not supported"))
  }
}
