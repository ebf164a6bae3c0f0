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

  test("cidrLookup picks longest prefix among overlapping CIDRs") {
    val ips = Seq((1L, "10.1.2.3"), (2L, "10.9.9.9"), (3L, "192.168.1.1"))
      .toDF("id", "ip")
    val cidrs = Seq(("10.0.0.0/8", "broad"), ("10.1.0.0/16", "narrow"),
      ("10.1.2.0/24", "narrowest")).toDF("cidr", "geo")
    val out = EnrichmentTable.cidrLookup(ips, col("ip"), cidrs)
      .select($"id", $"geo").as[(Long, Option[String])].collect().toMap
    assert(out.size == 3, "overlapping ranges must not duplicate events")
    assert(out(1L).contains("narrowest"))
    assert(out(2L).contains("broad"))
    assert(out(3L).isEmpty)
  }

  test("cidrLookup duplicate CIDR rows don't duplicate events") {
    val ips = Seq((1L, "10.1.2.3")).toDF("id", "ip")
    val cidrs = Seq(("10.0.0.0/8", "a"), ("10.0.0.0/8", "b")).toDF("cidr", "geo")
    val out = EnrichmentTable.cidrLookup(ips, col("ip"), cidrs)
      .select($"geo").as[String].collect().toSeq
    assert(out == Seq("a"))
  }
}
