package graft.enrich

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EnrichmentTableSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq((1L, "A"), (2L, "B"), (3L, "Z")).toDF("id", "seg")

  test("wildcard fallback fills misses") {
    val table = Seq(("A", "t1"), ("B", "t2"), ("*", "t0")).toDF("seg_k", "tier")
    val out = EnrichmentTable.lookupWithWildcard(events, table,
        col("seg"), "seg_k", "*", Seq("tier"))
      .select($"id", $"tier").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "t1", 2L -> "t2", 3L -> "t0"))
  }

  test("missing wildcard row degrades to nulls, never drops events") {
    val table = Seq(("A", "t1")).toDF("seg_k", "tier")
    val out = EnrichmentTable.lookupWithWildcard(events, table,
        col("seg"), "seg_k", "*", Seq("tier"))
      .select($"id", $"tier").as[(Long, Option[String])].collect().toMap
    assert(out.size == 3)
    assert(out(1L).contains("t1"))
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("multiple wildcard rows don't duplicate events") {
    val table = Seq(("A", "t1"), ("*", "t0"), ("*", "t9")).toDF("seg_k", "tier")
    val out = EnrichmentTable.lookupWithWildcard(events, table,
      col("seg"), "seg_k", "*", Seq("tier"))
    assert(out.count() == 3)
  }

  test("case-insensitive equality join") {
    val table = Seq(("a", "t1")).toDF("seg_k", "tier")
    val out = EnrichmentTable.lookup(events, table,
        Seq(EnrichmentTable.Equals(col("seg"), "seg_k", caseInsensitive = true)))
      .filter($"tier".isNotNull).select($"id").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }
}
