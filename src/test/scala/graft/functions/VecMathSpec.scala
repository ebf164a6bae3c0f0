package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ArrayDotProduct must be bit-identical to the HOF formula it
  * replaced (`aggregate(zip_with(x,y,(p,q)=>p*q), 0.0, acc+v)`) —
  * the oracle queries pin cosine results to 6 decimals, so any fold
  * or null-semantics drift breaks the strict gate.
  */
class VecMathSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(x: org.apache.spark.sql.Column,
                     y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  test("dot matches the HOF formula bit-for-bit on random vectors") {
    val rows = (1 to 500).map { i =>
      val rnd = new scala.util.Random(i)
      (Seq.fill(64)(rnd.nextDouble() * 2 - 1),
       Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
        VecMath.dot(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("hof"))
      .filter(col("fast") =!= col("hof") ||
        col("fast").isNull =!= col("hof").isNull)
    assert(diff.count() == 0)
  }

  test("null semantics match: empty, null element, unequal, null input") {
    val df = Seq(
      (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]),   // -> 0.0
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0)), // null elem
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)), // unequal
      (null, Seq[java.lang.Double](1.0))                             // null input
    ).toDF("a", "b")
    val got = df.select(
        VecMath.dot(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(got(0).getDouble(0) == 0.0)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0) && got(3).isNullAt(0))
  }

  test("cosine (now VecMath-backed) keeps zero-norm -> NaN and 6-dp parity") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),
      (Seq(0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0))
    ).toDF("a", "b")
    val got = df.select(graft.datapipe.Ann.cosine(col("a"), col("b"))
      .as("c")).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(got(2).isNaN)
  }

  test("dot stays inside whole-stage codegen") {
    // a local relation constant-folds away (no codegen subtree at
    // all), so build from range — Project over Range codegens, and a
    // broken doGenCode would fail the value check under that path
    val df = spark.range(1, 11).select(
      transform(sequence(lit(1), lit(4)),
        j => j.cast("double") + col("id")).as("a"),
      transform(sequence(lit(1), lit(4)),
        j => j.cast("double")).as("b"))
    val q = df.select(VecMath.dot(col("a"), col("b")).as("d"))
    val s = q.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(!s.contains("Found 0 WholeStageCodegen"), s)
    // id=1: (2,3,4,5)·(1,2,3,4) = 2+6+12+20 = 40
    assert(q.orderBy("d").head().getDouble(0) == 40.0)
  }
}
