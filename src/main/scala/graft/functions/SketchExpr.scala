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

  /** Name-resolved read plan for one array<struct> lane: (ordinal of
    * the double field, ordinal of the long field, exact element arity —
    * `getStruct` needs the true width). The old UDF read these fields
    * by NAME (`getAs("value")`); a positional read would silently swap
    * lanes for a caller whose struct declares them in another order, so
    * missing/mistyped fields are an error here, never a reorder.
    * NullType (an untyped null literal) gets a dummy plan — the kernel
    * null-checks the array before indexing.
    */
  private[functions] def laneStructPlan(dt: DataType, dName: String,
      lName: String, what: String): (Int, Int, Int) = dt match {
    case ArrayType(st: StructType, _) =>
      def idx(n: String, want: DataType): Int = {
        val i = st.fieldNames.indexOf(n)
        if (i < 0) throw new IllegalArgumentException(
          s"toSketch $what: element struct ${st.catalogString} lacks " +
            s"field '$n'")
        if (st.fields(i).dataType != want)
          throw new IllegalArgumentException(
            s"toSketch $what: field '$n' must be ${want.simpleString}, " +
              s"got ${st.fields(i).dataType.simpleString} — cast it " +
              "explicitly")
        i
      }
      (idx(dName, DoubleType), idx(lName, LongType), st.size)
    case NullType => (0, 1, 2)
    case other => throw new IllegalArgumentException(
      s"toSketch $what: expected array<struct<...>>, got " +
        other.simpleString)
  }

  /** transform_to_sketch over one metric row's raw lanes; null when the
    * row isn't sketch-shaped or the built sketch is empty (the encoder
    * then skips it, encoder.rs:324). The six trailing ints are the
    * name-resolved [[laneStructPlan]]s for dist and histo.
    */
  def toSketchKernel(vt: UTF8String, dist: ArrayData, histo: ArrayData,
                     cnt: java.lang.Long, mn: java.lang.Double,
                     mx: java.lang.Double, sm: java.lang.Double,
                     av: java.lang.Double,
                     ks: ArrayData, ns: ArrayData,
                     dvIdx: Int, drIdx: Int, distW: Int,
                     huIdx: Int, hcIdx: Int, histoW: Int): InternalRow = {
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
            val s = dist.getStruct(i, distW)
            val v = if (s.isNullAt(dvIdx)) 0.0 else s.getDouble(dvIdx)
            val r = if (s.isNullAt(drIdx)) 0L else s.getLong(drIdx)
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
            val s = histo.getStruct(i, histoW)
            buckets += ((if (s.isNullAt(huIdx)) 0.0 else s.getDouble(huIdx),
              if (s.isNullAt(hcIdx)) 0L else s.getLong(hcIdx)))
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

  /** Untyped null literals (`lit(null)`) get the canonical lane type —
    * a cast on a null can't reorder anything; every other input keeps
    * its own struct type for [[laneStructPlan]]'s by-name resolution.
    */
  private def nullLaneCast(c: Column, canonical: String): Column =
    ColumnBridge.expression(c) match {
      case l: org.apache.spark.sql.catalyst.expressions.Literal
          if l.dataType == NullType => c.cast(canonical)
      case _ => c
    }

  /** Column form of [[toSketchKernel]]. dist/histo element fields are
    * read by NAME (value/rate, upper_limit/count) via
    * [[laneStructPlan]] resolved from the input's actual struct type —
    * no positional cast, so a caller whose struct declares another
    * field order still reads correctly, and a missing/mistyped field
    * is an error instead of silently swapped lanes.
    */
  def toSketchLanes(vt: Column, dist: Column, histo: Column,
                    cnt: Column, mn: Column, mx: Column, sm: Column,
                    av: Column, ks: Column, ns: Column): Column =
    ColumnBridge.column(ToAgentSketchLanes(Seq(
      vt.cast("string"),
      nullLaneCast(dist, "array<struct<value:double,rate:bigint>>"),
      nullLaneCast(histo,
        "array<struct<upper_limit:double,count:bigint>>"),
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

  // name-resolved struct read plans, computed once from the RESOLVED
  // child types (and embedded as int literals in the generated code)
  @transient private lazy val distPlan: (Int, Int, Int) =
    SketchExprs.laneStructPlan(children(1).dataType, "value", "rate",
      "dist_samples")
  @transient private lazy val histoPlan: (Int, Int, Int) =
    SketchExprs.laneStructPlan(children(2).dataType, "upper_limit",
      "count", "histo_buckets")

  override def eval(input: InternalRow): Any = {
    val v = children.map(_.eval(input))
    SketchExprs.toSketchKernel(
      v(0).asInstanceOf[UTF8String],
      v(1).asInstanceOf[ArrayData], v(2).asInstanceOf[ArrayData],
      v(3).asInstanceOf[java.lang.Long],
      v(4).asInstanceOf[java.lang.Double], v(5).asInstanceOf[java.lang.Double],
      v(6).asInstanceOf[java.lang.Double], v(7).asInstanceOf[java.lang.Double],
      v(8).asInstanceOf[ArrayData], v(9).asInstanceOf[ArrayData],
      distPlan._1, distPlan._2, distPlan._3,
      histoPlan._1, histoPlan._2, histoPlan._3)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val args = (children.zip(evals)
      .map { case (c, e) => SketchExprs.boxedArg(c.dataType, e) } ++
      Seq(distPlan._1, distPlan._2, distPlan._3,
        histoPlan._1, histoPlan._2, histoPlan._3).map(_.toString))
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
