package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RouteSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(10.0), "error"),
    (2L, None, "info"),        // null value: predicates on it are SQL NULL
    (3L, Some(99.0), "info"),
    (4L, Some(1.0), "info")
  ).toDF("id", "value", "kind")

  test("route sends NULL-predicate events to _unmatched, not nowhere") {
    val routes = Seq(
      "err" -> (col("kind") === "error"),
      "big" -> (col("value") > 50.0))
    val outs = Route(df, routes)
    assert(outs("err").select("id").as[Long].collect().toSet == Set(1L))
    assert(outs("big").select("id").as[Long].collect().toSet == Set(3L))
    // id=2 has value=null -> (kind='error' OR value>50) is NULL -> unmatched
    assert(outs(Route.Unmatched).select("id").as[Long].collect().toSet == Set(2L, 4L))
    // every event lands somewhere
    val total = outs.values.map(_.count()).sum
    assert(total == 4)
  }

  test("tagged view matches apply() routing") {
    val routes = Seq(
      "err" -> (col("kind") === "error"),
      "big" -> (col("value") > 50.0))
    val tagged = Route.tagged(df, routes)
      .select($"id", $"route").as[(Long, String)].collect().toSet
    assert(tagged == Set(
      (1L, "err"), (2L, Route.Unmatched), (3L, "big"), (4L, Route.Unmatched)))
  }

  test("exclusive_route: first match wins, NULL predicate falls through") {
    val tagged = Route.exclusiveTag(df, Seq(
        "err" -> (col("kind") === "error"),
        "big" -> (col("value") > 50.0)))
      .select($"id", $"route").as[(Long, String)].collect().toMap
    assert(tagged == Map(
      1L -> "err", 2L -> Route.Unmatched, 3L -> "big", 4L -> Route.Unmatched))
  }
}
