package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LineAggSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq(
    (1, "java.lang.NullPointerException"),
    (2, "  at com.example.A"),
    (3, "  at com.example.B"),
    (4, "plain line"),
    (5, "another ERROR"),
    (6, "  at com.example.C")
  ).toDF("ord", "line").withColumn("file", lit("f1"))

  private def messages(mode: LineAgg.Mode, pattern: String): Seq[String] =
    LineAgg(lines, $"file", $"ord", $"line", mode, pattern)
      .orderBy($"first_order").select("message").as[String].collect().toSeq

  test("ContinueThrough attaches indented lines to the previous event") {
    val m = messages(LineAgg.ContinueThrough, "^\\s")
    assert(m == Seq(
      "java.lang.NullPointerException\n  at com.example.A\n  at com.example.B",
      "plain line",
      "another ERROR\n  at com.example.C"))
  }

  test("HaltBefore starts a new event at each matching line") {
    val m = messages(LineAgg.HaltBefore, "ERROR|Exception")
    assert(m == Seq(
      "java.lang.NullPointerException\n  at com.example.A\n  at com.example.B\nplain line",
      "another ERROR\n  at com.example.C"))
  }

  test("ContinueWith: a trailing-continuation marker joins the next line") {
    val cw = Seq((1, "cmd arg \\"), (2, "more args"), (3, "second"))
      .toDF("ord", "line").withColumn("file", lit("f"))
    val m = LineAgg(cw, $"file", $"ord", $"line",
        LineAgg.ContinueWith, "\\\\$")
      .orderBy($"first_order").select("message").as[String].collect().toSeq
    assert(m == Seq("cmd arg \\\nmore args", "second"))
  }

  test("HaltWith: the matching line closes its event") {
    val hw = Seq((1, "part a"), (2, "part b;"), (3, "next"))
      .toDF("ord", "line").withColumn("file", lit("f"))
    val m = LineAgg(hw, $"file", $"ord", $"line", LineAgg.HaltWith, ";$")
      .orderBy($"first_order").select("message").as[String].collect().toSeq
    assert(m == Seq("part a\npart b;", "next"))
  }
}
