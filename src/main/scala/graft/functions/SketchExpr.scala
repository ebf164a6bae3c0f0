package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.AgentSketch

/** Native-expression ports of the two metric-egress UDFs (the dd
  * sketch conversion and the remote-write quantile scan). The Scala-UDF
  * forms paid a full Catalyst→Scala conversion per row (a 64-element
  * `Seq[Row]` wrap of the sample array, plus an ExpressionEncoder
  * round-trip of the result struct); the egress_udfs A/B probe measured
  * that overhead at ~12× the actual sketch math. These expressions read
  * `ArrayData` in place and emit an `InternalRow`/`GenericArrayData`
  * directly — zero conversion — and their generated code is a single
  * static-kernel call, so the enclosing projection stays inside
  * whole-stage codegen (the [[VecMath.ArrayDotProduct]] pattern).
  *
  * Semantics are EXACTLY the UDFs' (sink_dd_sketch / sink_rw_families
  * oracles + DdMetricsSpec pin them): the conversion itself is
  * [[AgentSketch.Builder]], unchanged — reference
  * lib/vector-core/src/metrics/ddsketch.rs transform_to_sketch.
  */
object SketchExprs {

  private[functions] val lanesType: StructType = StructType(Seq(
    StructField("scnt", LongType, nullable = false),
    StructField("smin", DoubleType, nullable = false),
    StructField("smax", DoubleType, nullable = false),
    StructField("ssum", DoubleType, nullable = false),
    StructField("savg", DoubleType, nullable = false),
    StructField("sk", ArrayType(LongType, containsNull = false)),
    StructField("sn", ArrayType(LongType, containsNull = false))))

  private def longs(a: ArrayData): Array[Long] = {
    if (a == null) return Array.emptyLongArray
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = if (a.isNullAt(i)) 0L else a.getLong(i); i += 1 }
    out
  }

  /** transform_to_sketch over one metric row's raw lanes; null when the
    * row isn't sketch-shaped or the built sketch is empty (the encoder
    * then skips it, encoder.rs:324).
    */
  def toSketchKernel(vt: UTF8String, dist: ArrayData, histo: ArrayData,
                     cnt: java.lang.Long, mn: java.lang.Double,
                     mx: java.lang.Double, sm: java.lang.Double,
                     av: java.lang.Double,
                     ks: ArrayData, ns: ArrayData): InternalRow = {
    if (vt == null) return null
    vt.toString match {
      case "sketch" =>
        if (cnt == null || cnt.longValue() == 0L) null
        else new GenericInternalRow(Array[Any](
          cnt.longValue(),
          if (mn == null) 0.0 else mn.doubleValue(),
          if (mx == null) 0.0 else mx.doubleValue(),
          if (sm == null) 0.0 else sm.doubleValue(),
          if (av == null) 0.0 else av.doubleValue(),
          new GenericArrayData(longs(ks)), new GenericArrayData(longs(ns))))
      case "distribution" =>
        if (dist == null) return null
        val b = new AgentSketch.Builder
        val n = dist.numElements()
        var i = 0
        while (i < n) {
          if (!dist.isNullAt(i)) {
            val s = dist.getStruct(i, 2)
            val v = if (s.isNullAt(0)) 0.0 else s.getDouble(0)
            val r = if (s.isNullAt(1)) 0L else s.getLong(1)
            b.insertN(v, r)
          }
          i += 1
        }
        fromBuilder(b)
      case "histogram" =>
        if (histo == null) return null
        val b = new AgentSketch.Builder
        val n = histo.numElements()
        val buckets = Seq.newBuilder[(Double, Long)]
        var i = 0
        while (i < n) {
          if (!histo.isNullAt(i)) {
            val s = histo.getStruct(i, 2)
            buckets += ((if (s.isNullAt(0)) 0.0 else s.getDouble(0),
              if (s.isNullAt(1)) 0L else s.getLong(1)))
          }
          i += 1
        }
        b.insertInterpolateBuckets(buckets.result())
        fromBuilder(b)
      case _ => null
    }
  }

  private def fromBuilder(b: AgentSketch.Builder): InternalRow =
    if (b.isEmpty) null
    else new GenericInternalRow(Array[Any](b.count, b.min, b.max, b.sum,
      b.avg, new GenericArrayData(b.ks.toArray),
      new GenericArrayData(b.ns.toArray)))

  private[functions] val RwQuantiles = Array(0.5, 0.75, 0.9, 0.95, 0.99)

  /** The remote-write summary lanes of one agent sketch: the five
    * default quantiles (collector.rs:184-216), null for empty/absent
    * sketches.
    */
  def quantilesKernel(ks: ArrayData, ns: ArrayData, cnt: java.lang.Long,
                      mn: java.lang.Double,
                      mx: java.lang.Double): ArrayData = {
    if (cnt == null || cnt.longValue() == 0L || mn == null || mx == null)
      return null
    val k = scala.collection.immutable.ArraySeq.unsafeWrapArray(longs(ks))
    val n = scala.collection.immutable.ArraySeq.unsafeWrapArray(longs(ns))
    val out = new Array[Double](RwQuantiles.length)
    var i = 0
    while (i < RwQuantiles.length) {
      out(i) = AgentSketch.quantile(k, n, cnt.longValue(), mn.doubleValue(),
        mx.doubleValue(), RwQuantiles(i)).getOrElse(0.0)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column form of [[toSketchKernel]]; the casts pin the struct field
    * ORDER the kernel indexes by (no-op casts are elided).
    */
  def toSketchLanes(vt: Column, dist: Column, histo: Column,
                    cnt: Column, mn: Column, mx: Column, sm: Column,
                    av: Column, ks: Column, ns: Column): Column =
    ColumnBridge.column(ToAgentSketchLanes(Seq(
      vt.cast("string"),
      dist.cast("array<struct<value:double,rate:bigint>>"),
      histo.cast("array<struct<upper_limit:double,count:bigint>>"),
      cnt.cast("long"), mn.cast("double"), mx.cast("double"),
      sm.cast("double"), av.cast("double"),
      ks.cast("array<bigint>"), ns.cast("array<bigint>"))
      .map(ColumnBridge.expression)))

  /** Column form of [[quantilesKernel]]. */
  def sketchQuantiles(ks: Column, ns: Column, cnt: Column,
                      mn: Column, mx: Column): Column =
    ColumnBridge.column(AgentSketchQuantiles(Seq(
      ks.cast("array<bigint>"), ns.cast("array<bigint>"),
      cnt.cast("long"), mn.cast("double"), mx.cast("double"))
      .map(ColumnBridge.expression)))

  /** One boxed-arg java fragment per child for the generated
    * static-kernel call: `(isNull ? null : boxed(value))`.
    */
  private[functions] def boxedArg(dt: DataType, e: ExprCode): String =
    dt match {
      case LongType => s"(${e.isNull} ? null : java.lang.Long.valueOf(${e.value}))"
      case DoubleType => s"(${e.isNull} ? null : java.lang.Double.valueOf(${e.value}))"
      case _ => s"(${e.isNull} ? null : ${e.value})"
    }
}

/** `toSketch` as a native expression: children are
  * (vt, dist_samples, histo_buckets, cnt, min, max, sum, avg, ks, ns).
  */
case class ToAgentSketchLanes(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = SketchExprs.lanesType
  override def nullable: Boolean = true
  override def prettyName: String = "to_agent_sketch"

  override def eval(input: InternalRow): Any = {
    val v = children.map(_.eval(input))
    SketchExprs.toSketchKernel(
      v(0).asInstanceOf[UTF8String],
      v(1).asInstanceOf[ArrayData], v(2).asInstanceOf[ArrayData],
      v(3).asInstanceOf[java.lang.Long],
      v(4).asInstanceOf[java.lang.Double], v(5).asInstanceOf[java.lang.Double],
      v(6).asInstanceOf[java.lang.Double], v(7).asInstanceOf[java.lang.Double],
      v(8).asInstanceOf[ArrayData], v(9).asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val args = children.zip(evals)
      .map { case (c, e) => SketchExprs.boxedArg(c.dataType, e) }
      .mkString(", ")
    val lanes = ctx.freshName("lanes")
    ev.copy(code = code"""
      ${evals.map(_.code.toString).mkString("\n")}
      org.apache.spark.sql.catalyst.InternalRow $lanes =
        graft.functions.SketchExprs.toSketchKernel($args);
      boolean ${ev.isNull} = $lanes == null;
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = $lanes;""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ToAgentSketchLanes =
    copy(children = newChildren)
}

/** `sketchQs` as a native expression: children are (ks, ns, cnt, min,
  * max); returns the five default remote-write quantiles.
  */
case class AgentSketchQuantiles(children: Seq[Expression])
    extends Expression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "agent_sketch_quantiles"

  override def eval(input: InternalRow): Any = {
    val v = children.map(_.eval(input))
    SketchExprs.quantilesKernel(
      v(0).asInstanceOf[ArrayData], v(1).asInstanceOf[ArrayData],
      v(2).asInstanceOf[java.lang.Long],
      v(3).asInstanceOf[java.lang.Double], v(4).asInstanceOf[java.lang.Double])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val args = children.zip(evals)
      .map { case (c, e) => SketchExprs.boxedArg(c.dataType, e) }
      .mkString(", ")
    val qs = ctx.freshName("qs")
    ev.copy(code = code"""
      ${evals.map(_.code.toString).mkString("\n")}
      org.apache.spark.sql.catalyst.util.ArrayData $qs =
        graft.functions.SketchExprs.quantilesKernel($args);
      boolean ${ev.isNull} = $qs == null;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $qs;""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AgentSketchQuantiles =
    copy(children = newChildren)
}
