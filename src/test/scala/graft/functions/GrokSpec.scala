package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Grok compiler: core patterns, user-defined aliases (nested, named,
  * cyclic), and first-match parse_groks semantics.
  */
class GrokSpec extends SparkSpec {
  import spark.implicits._

  test("custom aliases expand recursively with correct capture order") {
    val aliases = Map(
      // literal segments are regex (reference grok semantics), so
      // literal brackets need escaping
      "APPLOG" -> "%{TIMESTAMP_ISO8601:ts} \\[%{LOGLEVEL:lvl}\\] %{GREEDYDATA:msg}",
      "WRAPPED" -> "pre %{APPLOG:whole} post")
    val df = Seq("pre 2024-01-02T03:04:05Z [ERROR] boom goes x post").toDF("l")
    val r = df.select(Grok.parse(col("l"), "%{WRAPPED}", aliases = aliases).as("g"))
      .select(col("g.whole"), col("g.ts"), col("g.lvl"), col("g.msg"))
      .collect().head
    assert(r == Row("2024-01-02T03:04:05Z [ERROR] boom goes x",
      "2024-01-02T03:04:05Z", "ERROR", "boom goes x"))
  }

  test("alias cycles are a compile error") {
    intercept[IllegalArgumentException] {
      Grok.compile("%{A}", Map("A" -> "%{B}", "B" -> "%{A}"))
    }
  }

  test("parse_groks tries patterns in order, first match wins") {
    val pats = Seq(
      "%{INT:n} ms",
      "took %{INT:n}")
    val df = Seq("42 ms", "took 7", "nope").toDF("l")
    val rows = df.select(Grok.parseFirstOf(col("l"), pats).as("g"))
      .select(col("g.n")).collect().map(r => Option(r.getString(0)))
    assert(rows.toSeq == Seq(Some("42"), Some("7"), None))
  }

  test("mismatched field sets across parse_groks patterns are rejected") {
    intercept[IllegalArgumentException] {
      Grok.parseFirstOf(lit("x"), Seq("%{INT:a}", "%{INT:b}"))
    }
  }
}
