package graft.streaming

import graft.SparkSpec

/** The `delay` transform's streaming kernel: events hold for delay_ms
  * of processing time, overflow strategies, condition re-arming.
  *
  * ProcessingTimeTimeout kernels report shouldRunAnotherBatch on every
  * trigger, so `processAllAvailable` would never return — these tests
  * poll the memory sink with deadlines instead (the same reason
  * ConfigLoader.RunningConfig uses its awaitDrained path).
  */
class DelaySpec extends SparkSpec {
  import spark.implicits._

  private final class Fixture(delayMs: Long, capacity: Int = 500,
                              strategy: String = "block",
                              cond: ((String, Long)) => Boolean = _ => true) {
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    private val grouped = mem.toDS().groupByKey(_ => 0)
    private val out = StatefulKernels.delay[Int, (String, Long)](
      grouped, delayMs, capacity, strategy, cond)
    val name = s"delayq${System.nanoTime()}"
    // per-fixture scratch checkpoint: keeps this query's state files out
    // of the shared temp-checkpoint namespace under full-suite load
    private val ckptDir =
      java.nio.file.Files.createTempDirectory(s"ckpt_$name")
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckptDir.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
      .start()

    def emitted(): Set[String] = {
      // a dead query would otherwise read as an empty sink and fail the
      // assertion with no cause — rethrow so flake retry can classify it
      q.exception.foreach(throw _)
      spark.sql(s"SELECT _1 FROM $name").collect().map(_.getString(0)).toSet
    }

    /** Poll until `want` is a subset of the emitted set (or 30s). */
    def await(want: Set[String]): Set[String] = {
      val deadline = System.currentTimeMillis() + 30000
      var got = emitted()
      while (!want.subsetOf(got) && System.currentTimeMillis() < deadline) {
        Thread.sleep(50); got = emitted()
      }
      got
    }
    def stop(): Unit = {
      q.stop()
      // scratch checkpoints would otherwise accumulate ckpt_delayq*
      // directories in the system temp dir across suite runs
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      try rm(ckptDir) catch { case _: java.io.IOException => () }
    }
  }

  test("events hold for delay_ms, then emit after it elapses") {
   retryOnStateStoreFlake() {
    val f = new Fixture(500L)
    try {
      val t0 = System.currentTimeMillis()
      f.mem.addData(("a", 1L), ("b", 2L))
      // within the delay window nothing may emit
      Thread.sleep(250)
      val early = f.emitted()
      assert(System.currentTimeMillis() - t0 >= 500 || early.isEmpty,
        s"emitted $early before the delay elapsed")
      val got = f.await(Set("a", "b"))
      assert(Set("a", "b").subsetOf(got))
      assert(System.currentTimeMillis() - t0 >= 500)
    } finally f.stop()
   }
  }

  test("drop_newest drops past capacity; forward emits undelayed") {
   retryOnStateStoreFlake() {
    val f1 = new Fixture(60000L, capacity = 2, strategy = "drop_newest")
    try {
      f1.mem.addData(("a", 1L), ("b", 2L), ("c", 3L))
      Thread.sleep(800)
      assert(f1.emitted().isEmpty) // a,b queued far out; c dropped
    } finally f1.stop()
    val f2 = new Fixture(60000L, capacity = 2, strategy = "forward")
    try {
      f2.mem.addData(("a", 1L), ("b", 2L), ("c", 3L))
      val got = f2.await(Set("c"))
      assert(got == Set("c")) // c bypassed the full queue, a/b still held
    } finally f2.stop()
   }
  }

  test("condition re-arms the delay until it passes") {
   retryOnStateStoreFlake() {
    val f = new Fixture(200L, cond = kv => kv._2 > 0)
    try {
      f.mem.addData(("pass", 1L), ("hold", -1L))
      val got = f.await(Set("pass"))
      assert(got.contains("pass"))
      Thread.sleep(600)
      assert(!f.emitted().contains("hold")) // keeps re-arming
    } finally f.stop()
   }
  }
}
