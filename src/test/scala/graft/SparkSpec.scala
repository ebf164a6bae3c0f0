package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for operator specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** Bounded retry for stateful-streaming tests: under full-suite disk
    * contention the HDFS state store's commit can intermittently fail
    * (CANNOT_WRITE_STATE_STORE / failedToCommitStateFile) even though
    * the kernel under test is correct — the same body passes 3/3 in
    * isolation. Retry ONLY that signature, bounded, and loudly; any
    * other failure propagates on the first throw.
    */
  def retryOnStateStoreFlake[T](attempts: Int = 3)(body: => T): T = {
    def isFlake(t: Throwable): Boolean = {
      val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => e.getClass.getName + ": " + String.valueOf(e.getMessage))
        .mkString("\n")
      chain.contains("CANNOT_WRITE_STATE_STORE") ||
        chain.contains("failedToCommitStateFile") ||
        chain.contains("Error committing version")
    }
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      i += 1
      try return body
      catch {
        case t: Throwable if isFlake(t) && i < attempts =>
          System.err.println(
            s"state-store commit flake (attempt $i/$attempts), retrying: $t")
          last = t
          Thread.sleep(500L * i)
        case t: Throwable => throw t
      }
    }
    throw last
  }
}

object SparkSpec {
  // one session per JVM (Test / fork := true gives the suite its own JVM)
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // test queries live for seconds; the state-store maintenance
      // thread's snapshot/cleanup pass only adds delete-vs-commit disk
      // races under full-suite load (the DelaySpec flake) — idle it
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
