package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming-state soak: drive O(10M) events through the stateful
  * kernels (GCRA throttle, reduce sessions, tag_cardinality_limit) on
  * the RocksDB state store across many micro-batches, recording
  * per-batch latency stability and state-store growth — the sustained
  * evidence that per-key state stays bounded and batch time stays flat
  * as history accumulates (the reference's long-running-process
  * equivalent; its TTL/limit caps map to our timeouts/limits).
  *
  * Env: SPARK_GRAFT_SOAK_BATCHES (default 50),
  * SPARK_GRAFT_SOAK_EVENTS (events per batch per kernel, default
  * 200000), SPARK_GRAFT_SOAK_KEYS (default 100000).
  * Output: one table row per kernel —
  * events, ev/s, batch p50/p95/max ms, first-5 vs last-5 batch mean
  * (drift), final state rows, state memory bytes.
  */
object SoakProbe {

  final case class Ev(k: Long, t: Long, tag: String)

  private final case class Result(name: String, events: Long,
      totalSec: Double, batchMs: Seq[Double], stateRows: Long,
      stateBytes: Long, outRows: Long)

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s((p * (s.length - 1)).round.toInt)
  }

  /** Accumulates input/output row counts across ALL micro-batches of
    * one query — ProcessingTimeTimeout kernels report
    * shouldRunAnotherBatch on every trigger, so `processAllAvailable`
    * never returns (see DelaySpec); batch completion is observed
    * through the listener instead.
    */
  private final class Tally extends
      org.apache.spark.sql.streaming.StreamingQueryListener {
    val in = new java.util.concurrent.atomic.AtomicLong(0L)
    val out = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var stateRows = 0L
    @volatile var stateBytes = 0L
    override def onQueryStarted(e: org.apache.spark.sql.streaming
        .StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: org.apache.spark.sql.streaming
        .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: org.apache.spark.sql.streaming
        .StreamingQueryListener.QueryProgressEvent): Unit = {
      in.addAndGet(e.progress.numInputRows)
      out.addAndGet(e.progress.sink.numOutputRows.max(0L))
      if (e.progress.stateOperators.nonEmpty) {
        stateRows = e.progress.stateOperators(0).numRowsTotal
        stateBytes = e.progress.stateOperators(0).memoryUsedBytes
      }
    }
  }

  private def runSoak(spark: SparkSession, name: String, batches: Int,
      perBatch: Int, keys: Int)(
      build: MemoryStream[Ev] => org.apache.spark.sql.DataFrame): Result = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val evEnc: org.apache.spark.sql.Encoder[Ev] =
      org.apache.spark.sql.Encoders.product[Ev]
    val mem = MemoryStream[Ev]
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"soak_$name").toString
    val tally = new Tally
    spark.streams.addListener(tally)
    val q: StreamingQuery = build(mem).writeStream
      .format("noop").queryName(s"soak_$name")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("10 milliseconds"))
      .start()
    val batchMs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t0 = System.nanoTime()
    try {
      var batch = 0
      while (batch < batches) {
        val base = batch.toLong * perBatch
        val evs = (0 until perBatch).map { i =>
          val g = base + i
          Ev(g % keys, g / 64, s"v${g % 150000}")
        }
        val want = base + perBatch
        val tb = System.nanoTime()
        mem.addData(evs)
        val deadline = System.nanoTime() + 300L * 1000000000L
        while (tally.in.get() < want && System.nanoTime() < deadline)
          Thread.sleep(2)
        require(tally.in.get() >= want,
          s"$name batch $batch stalled (${tally.in.get()} < $want)")
        batchMs += (System.nanoTime() - tb) / 1e6
        batch += 1
      }
    } finally {
      q.stop()
      spark.streams.removeListener(tally)
    }
    val totalSec = (System.nanoTime() - t0) / 1e9
    Result(name, batches.toLong * perBatch, totalSec, batchMs.toSeq,
      tally.stateRows, tally.stateBytes, tally.out.get())
  }

  /** Chaos leg 1 — kill/resume: a stateful query (GCRA throttle on the
    * RocksDB store) is stopped mid-stream and a NEW query resumes from
    * the same checkpoint. The resumed run's admitted-row set must be
    * IDENTICAL (with multiplicity) to an uninterrupted control run on
    * the same input — the restart evidence the flat-latency soak can't
    * give: state reloads from RocksDB, the replayed batch re-decides
    * identically, and the parquet sink's metadata log keeps output
    * exactly-once across the kill.
    */
  private def chaosResume(spark: SparkSession, files: Int, perFile: Int,
      keys: Int): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("soak_resume").toString
    // one parquet file per micro-batch (maxFilesPerTrigger=1) so the
    // control and chaos runs see identical batch boundaries
    (0 until files).foreach { b =>
      val lo = b.toLong * perFile
      spark.range(lo, lo + perFile)
        .select((col("id") % keys).as("k"),
          expr("id div 64").as("t")) // integer division: t stays BIGINT
        .coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val total = files.toLong * perFile
    def start(tag: String): (StreamingQuery, Tally) = {
      val ds = spark.readStream.schema("k BIGINT, t BIGINT")
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
        .as[(Long, Long)]
      val tally = new Tally
      spark.streams.addListener(tally)
      val q = graft.streaming.StatefulKernels.throttle[Long, (Long, Long)](
          ds.groupByKey(_._1), threshold = 10, windowMs = 1000L,
          eventTimeMs = (e: (Long, Long)) => e._2)
        .toDF("k", "t")
        .writeStream.format("parquet")
        .option("path", s"$base/out_$tag")
        .option("checkpointLocation", s"$base/ckpt_$tag")
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("10 milliseconds"))
        .start()
      (q, tally)
    }
    def drainTo(q: StreamingQuery, tally: Tally, want: Long): Unit = {
      val deadline = System.nanoTime() + 600L * 1000000000L
      while (tally.in.get() < want && System.nanoTime() < deadline)
        Thread.sleep(5)
      require(tally.in.get() >= want,
        s"resume soak stalled (${tally.in.get()} < $want)")
      q.stop()
      spark.streams.removeListener(tally)
    }
    val t0 = System.nanoTime()
    // control: uninterrupted run over all files
    val (qc, tc) = start("control")
    drainTo(qc, tc, total)
    val controlN = spark.read.parquet(s"$base/out_control").count()
    // chaos: KILL at ~half the input, resume from the same checkpoint
    val (q1, t1) = start("chaos")
    drainTo(q1, t1, total / 2)
    val killedAt = t1.in.get()
    val (q2, t2) = start("chaos") // same path + checkpoint → resume
    val deadline = System.nanoTime() + 600L * 1000000000L
    var outN = 0L
    while (outN < controlN && System.nanoTime() < deadline) {
      Thread.sleep(200)
      outN = spark.read.parquet(s"$base/out_chaos").count()
    }
    // settle, then re-count: catches late duplicate emission
    Thread.sleep(3000)
    outN = spark.read.parquet(s"$base/out_chaos").count()
    q2.stop()
    spark.streams.removeListener(t2)
    val secs = (System.nanoTime() - t0) / 1e9
    val control = spark.read.parquet(s"$base/out_control")
    val chaos = spark.read.parquet(s"$base/out_chaos")
    val missing = control.exceptAll(chaos).count()
    val extra = chaos.exceptAll(control).count()
    println(f"kill_resume      ${total}%10d events, killed at $killedAt, " +
      f"control_out=$controlN chaos_out=$outN " +
      f"missing=$missing extra=$extra state_rows=${t2.stateRows} " +
      f"(${secs}%.0f s)")
    require(missing == 0 && extra == 0 && outN == controlN,
      s"kill/resume output diverged: missing=$missing extra=$extra " +
        s"($outN vs $controlN)")
    // no state-row count assertion: GCRA states expire via
    // ProcessingTimeTimeout GC (bounded state is the FEATURE), so the
    // row count at stop time is timing-dependent — the state-restore
    // evidence is the byte-identical output above, which can only
    // happen if the replayed batch re-decided from the restored TATs
  }

  /** Chaos leg 2 — mid-soak config reload: a YAML topology with a
    * STATEFUL chain (streaming dedupe on RocksDB) and a stateless chain
    * (remap) gets a config edit swapping the remap body while events
    * flow. The diff must restart ONLY the remap chain; the dedupe
    * chain's query instance — and its seen-keys state — must survive,
    * proven by re-sending pre-reload messages after the reload and
    * observing ZERO re-emissions.
    */
  private def chaosReload(spark: SparkSession, n: Int): Unit = {
    // each chain gets its OWN source: a reload restarts the full
    // subgraph of any sink sharing a restarted component's upstream,
    // so an edit to the tag chain leaves the dedupe chain untouched
    // only when their sources are disjoint
    val srcA = java.nio.file.Files.createTempDirectory("soak_rl_a")
    val srcB = java.nio.file.Files.createTempDirectory("soak_rl_b")
    val work = java.nio.file.Files
      .createTempDirectory("soak_rl_work").toString
    def cfg(lane: String) =
      s"""
        |sources:
        |  src_dd:
        |    type: file
        |    path: $srcA
        |  src_tag:
        |    type: file
        |    path: $srcB
        |transforms:
        |  dd:
        |    type: dedupe
        |    inputs: [src_dd]
        |    fields:
        |      match: [message]
        |  tag:
        |    type: remap
        |    inputs: [src_tag]
        |    source: |
        |      .lane = "$lane"
        |sinks:
        |  soak_dedup_out:
        |    type: memory
        |    inputs: [dd]
        |  soak_tag_out:
        |    type: memory
        |    inputs: [tag]
        |""".stripMargin
    def append(dir: java.nio.file.Path, lines: Seq[String]): Unit =
      java.nio.file.Files.write(dir.resolve("app.log"),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    val t0 = System.nanoTime()
    val yaml1 = cfg("v1")
    val yaml2 = cfg("v2")
    var running = plans.ConfigLoader.run(spark, yaml1,
      "/root/testdata/sf0.001", work)
    try {
      append(srcA, (0 until n).map(i => s"m$i"))
      append(srcB, (0 until n).map(i => s"b$i"))
      running.processAllAvailable()
      val ddQ = running.queries("soak_dedup_out")
      val seen1 = spark.table("soak_dedup_out").count()
      val lane1 = spark.table("soak_tag_out")
        .groupBy("lane").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // swap the remap body mid-soak: only the tag chain restarts
      running = plans.ConfigLoader.reload(spark, running, yaml1, yaml2,
        "/root/testdata/sf0.001", work)
      require(running.queries("soak_dedup_out") eq ddQ,
        "reload restarted the untouched stateful chain")
      require(ddQ.isActive, "stateful chain died across reload")
      // re-send every pre-reload message + n fresh ones: the dedupe
      // kernel's seen-keys state must survive the reload untouched
      append(srcA, (0 until 2 * n).map(i => s"m$i"))
      append(srcB, (0 until n).map(i => s"c$i"))
      running.processAllAvailable()
      val dedupN = spark.table("soak_dedup_out").count()
      val reEmitted = dedupN - seen1 - n // only m{n}..m{2n-1} are new
      // the restarted tag chain re-tails its file from scratch with the
      // NEW body (the documented subgraph-restart semantics): all 2n
      // lines carry lane v2
      val lane2 = spark.table("soak_tag_out")
        .groupBy("lane").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"reload_swap      ${4 * n}%10d lines, " +
        f"dedup_out=$dedupN (pre-reload $seen1, re-emitted $reEmitted), " +
        f"lanes pre=$lane1 post=$lane2 (${secs}%.0f s)")
      require(seen1 == n && reEmitted == 0,
        s"dedupe state lost across reload: $seen1/$n then +$reEmitted dups")
      require(lane1 == Map("v1" -> n.toLong),
        s"pre-reload lanes wrong: $lane1")
      require(lane2 == Map("v2" -> 2L * n),
        s"post-reload lanes wrong: $lane2")
    } finally running.stopAll()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "50").toInt
    val perBatch = sys.env.getOrElse("SPARK_GRAFT_SOAK_EVENTS", "200000").toInt
    val keys = sys.env.getOrElse("SPARK_GRAFT_SOAK_KEYS", "100000").toInt
    val spark = Graft.session(cpus)
    // the production state store: RocksDB, bounded executor memory
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    import spark.implicits._

    // SPARK_GRAFT_SOAK_CHAOS=true → run the chaos legs after the soak;
    // =only → just the chaos legs (dev loop)
    val chaos = sys.env.getOrElse("SPARK_GRAFT_SOAK_CHAOS", "false")
    if (chaos == "only") {
      println("chaos: kill/resume from RocksDB checkpoint + mid-soak reload")
      chaosResume(spark, files = 30,
        perFile = math.max(1000, perBatch / 4), keys = keys)
      chaosReload(spark, n = 2000)
      spark.stop()
      return
    }

    println(s"soak: $batches batches x $perBatch events, $keys keys, " +
      s"RocksDB state store")

    val results = Seq(
      // GCRA throttle: one Double TAT per key; admits a 10-burst then
      // 10/second sustained (event time advances ~3 ms per event)
      runSoak(spark, "throttle", batches, perBatch, keys) { mem =>
        graft.streaming.StatefulKernels.throttle(
          mem.toDS().groupByKey(_.k), threshold = 10, windowMs = 1000L,
          eventTimeMs = (e: Ev) => e.t).toDF()
      },
      // reduce sessions: merge-count state flushing every 16 events
      // per key (max_events) — state stays one small tuple per key
      runSoak(spark, "reduce_sessions", batches, perBatch, keys) { mem =>
        graft.streaming.ReduceSessions(
          mem.toDS().groupByKey(_.k),
          graft.streaming.ReduceSessions.Config[Ev, (Long, Long)](
            init = e => (e.t, 1L),
            merge = (a, e) => (a._1 + e.t, a._2 + 1L),
            expireAfterMs = 600000L,
            maxEvents = Some(16)))(
          (k, a, _) => (k, a._1, a._2)).toDF()
      },
      // tag_cardinality_limit (exact): 64 tag-key groups, accepted-set
      // capped at 5000 values — state is bounded by limit, not input
      runSoak(spark, "tag_cardinality", batches, perBatch, keys) { mem =>
        graft.streaming.StatefulKernels.tagCardinalityLimit(
          mem.toDS().groupByKey(_.k % 64),
          valueLimit = 5000,
          tagValue = (e: Ev) => Some(e.tag),
          onAllowed = (e: Ev) => e,
          onExceeded = (_: Ev) => None).toDF()
      })

    println(f"${"kernel"}%-16s ${"events"}%10s ${"ev/s"}%10s " +
      f"${"p50ms"}%8s ${"p95ms"}%8s ${"maxms"}%8s ${"drift"}%7s " +
      f"${"stateRows"}%10s ${"stateMB"}%8s ${"outRows"}%10s")
    results.foreach { r =>
      val first5 = r.batchMs.take(5).sum / 5
      val last5 = r.batchMs.takeRight(5).sum / 5
      println(f"${r.name}%-16s ${r.events}%10d " +
        f"${r.events / r.totalSec}%10.0f ${pct(r.batchMs, 0.5)}%8.0f " +
        f"${pct(r.batchMs, 0.95)}%8.0f ${r.batchMs.max}%8.0f " +
        f"${last5 / first5}%7.2f ${r.stateRows}%10d " +
        f"${r.stateBytes / 1048576.0}%8.1f ${r.outRows}%10d")
    }
    if (chaos.toBoolean) {
      println("chaos: kill/resume from RocksDB checkpoint + mid-soak reload")
      chaosResume(spark, files = 30,
        perFile = math.max(1000, perBatch / 4), keys = keys)
      chaosReload(spark, n = 2000)
    }
    spark.stop()
  }
}
