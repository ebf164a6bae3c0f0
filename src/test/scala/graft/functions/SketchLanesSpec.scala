package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins for the by-NAME struct reads in the native toSketch lanes: the
  * old UDF read `getAs("value")` by name, so a caller whose struct
  * declares (rate, value) order must get identical lanes — a
  * positional cast would silently swap them (bigint↔double casts
  * succeed) — and a struct MISSING a lane field must error loudly.
  */
class SketchLanesSpec extends SparkSpec {

  private def lanes(df: DataFrame): Seq[Any] = {
    val vt = df.columns.head match {
      case "dist" => lit("distribution")
      case _ => lit("histogram")
    }
    val (d, h) =
      if (df.columns.head == "dist") (col("dist"), lit(null))
      else (lit(null), col("histo"))
    val r = df.select(SketchExprs.toSketchLanes(vt, d, h,
      lit(null), lit(null), lit(null), lit(null), lit(null),
      lit(null), lit(null)).as("l"))
      .collect().head.getStruct(0)
    r.toSeq.map {
      case s: scala.collection.Seq[_] => s.toList
      case other => other
    }
  }

  test("distribution lanes read (value, rate) by name in any order") {
    val canonical = spark.sql(
      "select array(named_struct('value', 1.5d, 'rate', 3L), " +
        "named_struct('value', 2.5d, 'rate', 1L)) as dist")
    val reversed = spark.sql(
      "select array(named_struct('rate', 3L, 'value', 1.5d), " +
        "named_struct('rate', 1L, 'value', 2.5d)) as dist")
    // an extra field between the lanes must not shift the reads either
    val padded = spark.sql(
      "select array(named_struct('rate', 3L, 'pad', 'x', 'value', 1.5d), " +
        "named_struct('rate', 1L, 'pad', 'y', 'value', 2.5d)) as dist")
    val want = lanes(canonical)
    assert(lanes(reversed) == want)
    assert(lanes(padded) == want)
    assert(want.head == 4L) // cnt = 3 + 1 inserts
  }

  test("histogram lanes read (upper_limit, count) by name in any order") {
    val canonical = spark.sql(
      "select array(named_struct('upper_limit', 1.0d, 'count', 2L), " +
        "named_struct('upper_limit', 4.0d, 'count', 3L)) as histo")
    val reversed = spark.sql(
      "select array(named_struct('count', 2L, 'upper_limit', 1.0d), " +
        "named_struct('count', 3L, 'upper_limit', 4.0d)) as histo")
    assert(lanes(reversed) == lanes(canonical))
  }

  test("missing or mistyped lane fields error instead of swapping") {
    val noRate = spark.sql(
      "select array(named_struct('value', 1.5d, 'r8', 3L)) as dist")
    val e1 = intercept[Exception] { lanes(noRate) }
    assert(e1.getMessage.contains("rate") ||
      Option(e1.getCause).exists(_.getMessage.contains("rate")))
    val intRate = spark.sql(
      "select array(named_struct('value', 1.5d, 'rate', 3)) as dist")
    val e2 = intercept[Exception] { lanes(intRate) }
    assert(e2.getMessage.contains("cast it explicitly") ||
      Option(e2.getCause).exists(_.getMessage.contains("cast it explicitly")))
  }
}
