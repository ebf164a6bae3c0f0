package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

final case class Ev(user: String, seq: Long, kind: String, value: Double)
final case class SessionOut(user: String, n: Int, sum: Double, reason: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** Run a streaming Dataset to completion over one batch of inputs. */
  private def runStream[T, O](input: Seq[T], name: String)(
      f: Dataset[T] => Dataset[O])(implicit et: org.apache.spark.sql.Encoder[T],
      eo: org.apache.spark.sql.Encoder[O]): Seq[O] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[T]
    mem.addData(input: _*)
    // AvailableNow: process everything then self-terminate — with
    // ProcessingTimeTimeout state, an unbounded trigger would keep
    // scheduling timeout-check batches and never go idle
    val q = f(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start()
    // ProcessingTimeTimeout queries never self-terminate under
    // AvailableNow (timeout-check batches schedule forever), so a plain
    // awaitTermination always burns its full timeout. Drain by output
    // stability instead: done when rows exist and stay unchanged longer
    // than any test's expire window (1.5s) plus slack. 90s deadline:
    // under FULL-SUITE parallel load a single micro-batch can stall
    // >30s (observed flake), while isolated runs finish in seconds.
    val deadline = System.currentTimeMillis() + 90000
    var last = -1L
    var stableSince = System.currentTimeMillis()
    var drained = false
    while (!drained && q.isActive &&
      System.currentTimeMillis() < deadline) {
      val n = spark.table(name).count()
      if (n != last) { last = n; stableSince = System.currentTimeMillis() }
      else if (n > 0 &&
        System.currentTimeMillis() - stableSince > 2500) drained = true
      Thread.sleep(100)
    }
    // stop() interrupts the stream thread; if a state-store commit is in
    // flight (ProcessingTimeTimeout queries schedule batches forever, so
    // one usually is), the terminal CANNOT_COMMIT(InterruptedException)
    // is the documented benign teardown race — swallow ONLY that
    try q.stop() catch {
      case e: Throwable if {
        var c: Throwable = e; var benign = false
        while (c != null && !benign) {
          benign = c.isInstanceOf[InterruptedException]
          c = c.getCause
        }
        benign
      } => ()
    }
    spark.table(name).as[O].collect().toSeq
  }

  test("ReduceSessions flushes on max_events and merges per key") {
    val events = Seq(
      Ev("a", 1, "x", 1.0), Ev("a", 2, "x", 2.0), Ev("a", 3, "x", 3.0),
      Ev("b", 1, "x", 10.0))
    val out = runStream(events, "rs_max") { ds =>
      ReduceSessions(
        ds.groupByKey(_.user),
        ReduceSessions.Config[Ev, (Int, Double)](
          init = e => (1, e.value),
          merge = (a, e) => (a._1 + 1, a._2 + e.value),
          maxEvents = Some(2), expireAfterMs = 1500L))(
        (k, a, r) => SessionOut(k, a._1, a._2, r.toString))
    }
    // key a: [1,2] flushed by MaxEvents; the open sessions ([3] for a,
    // [10] for b) drain as Expired when the AvailableNow run terminates —
    // the reference likewise flushes pending reduce state on shutdown
    assert(out.toSet == Set(
      SessionOut("a", 2, 3.0, "MaxEvents"),
      SessionOut("a", 1, 3.0, "Expired"),
      SessionOut("b", 1, 10.0, "Expired")))
  }

  test("ReduceSessions ends_when closes the session including the event") {
    val events = Seq(
      Ev("a", 1, "start", 1.0), Ev("a", 2, "mid", 2.0), Ev("a", 3, "end", 4.0),
      Ev("a", 4, "mid", 8.0))
    val out = runStream(events, "rs_ends") { ds =>
      ReduceSessions(
        ds.groupByKey(_.user),
        ReduceSessions.Config[Ev, (Int, Double)](
          init = e => (1, e.value),
          merge = (a, e) => (a._1 + 1, a._2 + e.value),
          endsWhen = Some(_.kind == "end"), expireAfterMs = 1500L))(
        (k, a, r) => SessionOut(k, a._1, a._2, r.toString))
    }
    assert(out.toSet == Set(
      SessionOut("a", 3, 7.0, "EndsWhen"),
      SessionOut("a", 1, 8.0, "Expired")))
  }

  test("ReduceSessions starts_when flushes the previous session first") {
    val events = Seq(
      Ev("a", 1, "start", 1.0), Ev("a", 2, "mid", 2.0),
      Ev("a", 3, "start", 4.0), Ev("a", 4, "mid", 8.0))
    val out = runStream(events, "rs_starts") { ds =>
      ReduceSessions(
        ds.groupByKey(_.user),
        ReduceSessions.Config[Ev, (Int, Double)](
          init = e => (1, e.value),
          merge = (a, e) => (a._1 + 1, a._2 + e.value),
          startsWhen = Some(_.kind == "start"), expireAfterMs = 1500L))(
        (k, a, r) => SessionOut(k, a._1, a._2, r.toString))
    }
    assert(out.toSet == Set(
      SessionOut("a", 2, 3.0, "NewSessionStart"),
      SessionOut("a", 2, 12.0, "Expired")))
  }

  test("throttle GCRA admits a burst of exactly threshold per key") {
    // 6 simultaneous events for user a; threshold 3 per 10s
    val events = (1 to 6).map(i => Ev("a", 1000L, "x", i.toDouble)) ++
      Seq(Ev("b", 1000L, "x", 0))
    val out = runStream(events, "thr") { ds =>
      StatefulKernels.throttle(
        ds.groupByKey(_.user), threshold = 3, windowMs = 10000L,
        eventTimeMs = (e: Ev) => e.seq)
    }
    assert(out.count(_.user == "a") == 3)
    assert(out.count(_.user == "b") == 1)
  }

  test("throttle excluded events bypass and never consume quota") {
    val events = (1 to 6).map(i =>
      Ev("a", 1000L, if (i % 2 == 0) "vip" else "x", i.toDouble))
    val out = runStream(events, "thr_ex") { ds =>
      StatefulKernels.throttle(
        ds.groupByKey(_.user), threshold = 2, windowMs = 10000L,
        eventTimeMs = (e: Ev) => e.seq,
        exclude = (e: Ev) => e.kind == "vip")
    }
    // all 3 vip bypass; 2 of 3 normal admitted
    assert(out.count(_.kind == "vip") == 3)
    assert(out.count(_.kind == "x") == 2)
  }

  test("dedupe emits only first event per key") {
    val events = Seq(
      Ev("a", 1, "x", 1.0), Ev("a", 2, "x", 2.0),
      Ev("b", 1, "x", 3.0), Ev("a", 3, "x", 4.0))
    val out = runStream(events, "ddp") { ds =>
      StatefulKernels.dedupe(ds.groupByKey(e => (e.user, e.kind)))
    }
    assert(out.map(e => (e.user, e.seq)).toSet == Set(("a", 1L), ("b", 1L)))
  }

  test("incrementalToAbsolute keeps a running total per series") {
    val events = Seq(
      Ev("s1", 1, "incremental", 1.0), Ev("s1", 2, "incremental", 2.0),
      Ev("s1", 3, "absolute", 100.0), Ev("s1", 4, "incremental", 4.0))
    val out = runStream(events, "ita") { ds =>
      StatefulKernels.incrementalToAbsolute(
        ds.groupByKey(_.user),
        value = (e: Ev) => e.value,
        isIncremental = (e: Ev) => e.kind == "incremental",
        out = (e: Ev, abs: Double) => (e.seq, abs))
    }
    assert(out.toMap == Map(1L -> 1.0, 2L -> 3.0, 3L -> 100.0, 4L -> 7.0))
  }

  test("sampleCount keeps every Nth event per key") {
    val events = (0 until 10).map(i => Ev("a", i, "x", 0))
    val out = runStream(events, "smp") { ds =>
      StatefulKernels.sampleCount(ds.groupByKey(_.user), rate = 3)
    }
    assert(out.map(_.seq).toSet == Set(0L, 3L, 6L, 9L))
  }

  test("windowLookback emits buffer + trigger + following events") {
    val events = Seq(
      Ev("a", 1, "x", 0), Ev("a", 2, "x", 0), Ev("a", 3, "x", 0),
      Ev("a", 4, "boom", 0), Ev("a", 5, "x", 0), Ev("a", 6, "x", 0),
      Ev("a", 7, "x", 0))
    val out = runStream(events, "wlb") { ds =>
      StatefulKernels.windowLookback(
        ds.groupByKey(_.user),
        flushWhen = (e: Ev) => e.kind == "boom",
        numEventsBefore = 2, numEventsAfter = 1)
    }
    // buffer holds [2,3] (size 2), trigger 4, then 5; 6,7 rebuffered
    assert(out.map(_.seq).sorted == Seq(2L, 3L, 4L, 5L))
  }

  test("tagCardinalityLimit exact mode: first N values win, others dropped") {
    val events = Seq(
      Ev("host", 1, "h1", 0), Ev("host", 2, "h2", 0), Ev("host", 3, "h1", 0),
      Ev("host", 4, "h3", 0), Ev("host", 5, "h2", 0))
    val out = runStream(events, "tcl") { ds =>
      StatefulKernels.tagCardinalityLimit(
        ds.groupByKey(_.user),
        valueLimit = 2,
        tagValue = (e: Ev) => Some(e.kind),
        onAllowed = (e: Ev) => e,
        onExceeded = (_: Ev) => None)
    }
    assert(out.map(_.seq).sorted == Seq(1L, 2L, 3L, 5L))
  }

  test("tagCardinalityLimit bloom mode behaves like exact on distinct values") {
    val events = (1 to 20).map(i => Ev("host", i, s"v${i % 5}", 0))
    val exact = runStream(events, "tclx") { ds =>
      StatefulKernels.tagCardinalityLimit(
        ds.groupByKey(_.user), valueLimit = 3,
        tagValue = (e: Ev) => Some(e.kind),
        onAllowed = (e: Ev) => e, onExceeded = (_: Ev) => None)
    }
    val bloom = runStream(events, "tclb") { ds =>
      StatefulKernels.tagCardinalityLimit(
        ds.groupByKey(_.user), valueLimit = 3,
        tagValue = (e: Ev) => Some(e.kind),
        onAllowed = (e: Ev) => e, onExceeded = (_: Ev) => None,
        probabilistic = true)
    }
    assert(bloom.map(_.seq).sorted == exact.map(_.seq).sorted)
  }

  test("events remap pipeline runs unchanged under Structured Streaming") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val batch = graft.Graft.table(spark, dir, "events")
    val expected = graft.Queries.eventsRemap(batch).count()
    // streaming file source wants a DIRECTORY of immutable files
    val streamDir = java.nio.file.Files.createTempDirectory("ev_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("part-0.parquet"))
    // same raw schema; same ts normalization as Graft.table; SAME remap code
    val raw = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = graft.Graft.normalizeTs(
      spark.readStream.schema(raw).parquet(streamDir.toString))
    val q = graft.Queries.eventsRemap(stream).writeStream
      .format("memory").queryName("ev_remap")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()
    assert(spark.table("ev_remap").count() == expected)
  }

  test("exec source captures process stdout as rows") {
    val df = StreamRunner.exec(spark, Seq("sh", "-c", "echo one; echo two"))
    assert(df.as[String].collect().toSeq == Seq("one", "two"))
  }

  test("demoLogs generates parseable syslog lines") {
    import org.apache.spark.sql.functions._
    val df = StreamRunner.demoLogs(spark, rowsPerSecond = 100, format = "syslog")
    val q = df.writeStream.format("memory").queryName("demo")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      Thread.sleep(1500)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("demo")
    if (rows.count() > 0) {
      val parsed = rows.select(
        graft.functions.Vrl.parseSyslog3164(col("message")).as("p"))
        .select("p.priority", "p.hostname")
      assert(parsed.filter(col("priority").isNotNull).count() == rows.count())
    }
  }

  test("demoLogs shuffle format draws from lines with sequence prefix") {
    import org.apache.spark.sql.functions._
    val df = StreamRunner.demoLogs(spark, rowsPerSecond = 100,
      format = "shuffle", lines = Seq("alpha", "beta"), sequence = true)
    val q = df.writeStream.format("memory").queryName("demo_shuffle")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      Thread.sleep(1500)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("demo_shuffle")
      .select("message").collect().map(_.getString(0))
    if (rows.nonEmpty) {
      assert(rows.forall(_.matches("\\d+ (alpha|beta)")), rows.take(3).toSeq)
    }
    // empty lines list is a config error like the reference's validator
    intercept[IllegalArgumentException] {
      StreamRunner.demoLogs(spark, 1, format = "shuffle")
    }
  }
}
