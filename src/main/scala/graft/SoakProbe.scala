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
    spark.stop()
  }
}
