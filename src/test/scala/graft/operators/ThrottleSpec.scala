package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ThrottleSpec extends SparkSpec {
  import spark.implicits._

  private def events = (1 to 10).map { i =>
    (i.toLong, "k", java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
      i % 2 == 0) // even ids are "excluded"
  }.toDF("id", "key", "ts", "vip")

  test("throttle keeps first N per key+window") {
    val out = Throttle(events, col("key"), col("ts"), "1 hour",
      threshold = 3, orderCol = col("id"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("excluded events bypass AND never consume quota") {
    val out = Throttle(events, col("key"), col("ts"), "1 hour",
      threshold = 3, orderCol = col("id"), exclude = Some(col("vip")))
    // vip (even) ids all pass; threshold=3 applies to odds only: 1,3,5
    assert(out.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L, 10L))
  }

  test("NULL exclude predicate counts as not-excluded") {
    val withNull = events.withColumn("vip",
      when(col("id") === 1, lit(null).cast("boolean")).otherwise(col("vip")))
    val out = Throttle(withNull, col("key"), col("ts"), "1 hour",
      threshold = 2, orderCol = col("id"), exclude = Some(col("vip")))
    // id=1 vip=null -> throttleable; odds quota=2 -> 1,3; evens bypass
    assert(out.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 6L, 8L, 10L))
  }
}
