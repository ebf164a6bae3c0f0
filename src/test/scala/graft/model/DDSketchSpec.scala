package graft.model

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DDSketchSpec extends SparkSpec {
  import spark.implicits._

  test("quantile estimates are within the relative-error bound") {
    val n = 10000
    val df = (1 to n).map(_.toDouble).toDF("v").repartition(7)
    val sk = DDSketch.agg()
    val row = df.agg(sk($"v").as("s"))
      .select(
        DDSketch.quantileValue($"s", 0.5).as("q50"),
        DDSketch.quantileValue($"s", 0.99).as("q99"),
        $"s.total")
      .head()
    val eps = DDSketch.relativeError() + 1e-9
    assert(row.getLong(2) == n)
    assert(math.abs(row.getDouble(0) - 5000.0) / 5000.0 <= eps)
    assert(math.abs(row.getDouble(1) - 9900.0) / 9900.0 <= eps)
  }

  test("zero bucket handling: all-zero input yields 0 quantiles") {
    val df = Seq(0.0, 0.0, 0.0).toDF("v")
    val sk = DDSketch.agg()
    val q = df.agg(sk($"v").as("s"))
      .select(DDSketch.quantileValue($"s", 0.9)).as[Double].head()
    assert(q == 0.0)
  }

  test("merge across partitions equals single-partition result") {
    val vals = (1 to 1000).map(i => (i % 13).toDouble + 0.5)
    val sk = DDSketch.agg()
    val a = vals.toDF("v").repartition(8).agg(sk($"v").as("s"))
      .select(DDSketch.quantileValue($"s", 0.5)).as[Double].head()
    val b = vals.toDF("v").coalesce(1).agg(sk($"v").as("s"))
      .select(DDSketch.quantileValue($"s", 0.5)).as[Double].head()
    assert(a == b)
  }
}
