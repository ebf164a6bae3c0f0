package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TagCardinalityLimitSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
    (4L, Some("c")), (5L, Some("a")), (6L, None: Option[String])
  ).toDF("id", "tag")

  test("DropEvent keeps first-N distinct values and passes null-tag rows") {
    val out = TagCardinalityLimit(events, "tag", valueLimit = 2, col("id"))
    // first 2 distinct values by first-seen: a, b; null-tag rows unaffected
    assert(out.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 5L, 6L))
  }

  test("null tags don't consume a value slot") {
    val out = TagCardinalityLimit(events, "tag", valueLimit = 3, col("id"))
    // a, b, c all fit in limit=3 (null is not a value)
    assert(out.count() == 6)
  }

  test("DropTag nulls the tag beyond the limit, keeps the event") {
    val out = TagCardinalityLimit(events, "tag", valueLimit = 2, col("id"),
      action = TagCardinalityLimit.DropTag)
    assert(out.count() == 6)
    val tags = out.select("id", "tag").as[(Long, Option[String])].collect().toMap
    assert(tags(4L).isEmpty) // "c" exceeded the limit -> tag dropped
    assert(tags(5L).contains("a"))
  }
}
