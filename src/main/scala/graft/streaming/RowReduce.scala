package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset, Row}
import org.apache.spark.sql.types._

import graft.operators.Reduce

/** Row-level session `reduce` for the config loader's STREAMING path:
  * the reference's merge strategies (merge_strategy.rs:18-56) and
  * type-based defaults (config.rs:82-90) applied per field inside a
  * [[ReduceSessions]] state machine, so a `type: reduce` block in a
  * YAML config works on live sources exactly like the batch form works
  * on tables.
  *
  * The batch [[graft.operators.Reduce]] expresses each strategy as a
  * native Catalyst aggregate (map-side partial agg, codegen); sessions
  * over an unbounded stream can't — state must live across
  * micro-batches, so the strategies become plain Scala fold functions
  * over the per-key accumulator. Events merge in micro-batch arrival
  * order (the reference relies on single-stream arrival order the same
  * way, transform.rs).
  */
object RowReduce {

  /** One value field's accumulation: `outFields` describes what it
    * contributes to the output schema (timestamps contribute two
    * columns — first and `_end` — per the reference's convention).
    */
  private final case class FieldPlan(
      idx: Int,
      outFields: Seq[StructField],
      init: Any => Any,
      merge: (Any, Any) => Any,
      finish: Any => Seq[Any])

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def toNum(dt: DataType, v: Any): Any = v match {
    case null => null
    case n: Number => if (isIntegral(dt)) (n.longValue: Any) else (n.doubleValue: Any)
    case other => other
  }

  private def addNum(dt: DataType, a: Any, b: Any): Any = (a, b) match {
    case (null, y) => y
    case (x, null) => x
    case (x: java.lang.Long, y: java.lang.Long) => x + y
    case (x: Number, y: Number) =>
      if (isIntegral(dt)) (x.longValue + y.longValue: Any)
      else (x.doubleValue + y.doubleValue: Any)
    case _ => a
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Number, y: Number) =>
      java.lang.Double.compare(x.doubleValue, y.doubleValue)
    case (x: Comparable[_], y: AnyRef) =>
      x.asInstanceOf[Comparable[AnyRef]].compareTo(y)
    case _ => 0
  }

  /** Flatten an array value to its elements, or wrap a scalar. */
  private def elems(v: Any): List[Any] = v match {
    case null => Nil
    case s: scala.collection.Seq[_] => s.toList
    case other => List(other)
  }

  private def planFor(f: StructField, idx: Int,
                      strategy: Option[Reduce.MergeStrategy]): FieldPlan = {
    def keepFirst = FieldPlan(idx, Seq(f), identity,
      (a, b) => if (a == null) b else a, a => Seq(a))
    def keepLast = FieldPlan(idx, Seq(f), identity,
      (a, b) => if (b == null) a else b, a => Seq(a))
    def numericSum = {
      val outDt = if (isIntegral(f.dataType)) LongType else DoubleType
      FieldPlan(idx, Seq(StructField(f.name, outDt, nullable = true)),
        v => toNum(f.dataType, v),
        (a, b) => addNum(f.dataType, a, toNum(f.dataType, b)),
        a => Seq(a))
    }
    strategy match {
      case Some(Reduce.First) => keepFirst
      case Some(Reduce.Last)  => keepLast
      case Some(Reduce.Sum)   => numericSum
      case Some(Reduce.Max) => FieldPlan(idx, Seq(f), identity,
        (a, b) => if (b == null) a else if (a == null || cmp(b, a) > 0) b else a,
        a => Seq(a))
      case Some(Reduce.Min) => FieldPlan(idx, Seq(f), identity,
        (a, b) => if (b == null) a else if (a == null || cmp(b, a) < 0) b else a,
        a => Seq(a))
      case Some(Reduce.ToArray) => FieldPlan(idx,
        Seq(StructField(f.name, ArrayType(f.dataType), nullable = true)),
        v => if (v == null) Vector.empty[Any] else Vector(v),
        (a, b) => if (b == null) a else a.asInstanceOf[Vector[Any]] :+ b,
        a => Seq(a.asInstanceOf[Vector[Any]]))
      case Some(Reduce.Concat(sep)) => f.dataType match {
        // Concat on an array field appends the arrays (merge_strategy.rs
        // Concat on Value::Array), not a string join
        case ArrayType(_, _) => FieldPlan(idx, Seq(f),
          v => elems(v).toVector,
          (a, b) => a.asInstanceOf[Vector[Any]] ++ elems(b),
          a => Seq(a.asInstanceOf[Vector[Any]]))
        case _ => FieldPlan(idx,
          Seq(StructField(f.name, StringType, nullable = true)),
          v => if (v == null) null else String.valueOf(v),
          (a, b) =>
            if (b == null) a
            else if (a == null) String.valueOf(b)
            else s"$a$sep$b",
          a => Seq(a))
      }
      case Some(Reduce.ShortestArray) => FieldPlan(idx, Seq(f), identity,
        (a, b) => if (b == null) a
          else if (a == null || elems(b).size < elems(a).size) b else a,
        a => Seq(a))
      case Some(Reduce.LongestArray) => FieldPlan(idx, Seq(f), identity,
        (a, b) => if (b == null) a
          else if (a == null || elems(b).size > elems(a).size) b else a,
        a => Seq(a))
      case Some(Reduce.FlatUnique) =>
        val elemDt = f.dataType match {
          case ArrayType(e, _) => e
          case dt => dt
        }
        FieldPlan(idx,
          Seq(StructField(f.name, ArrayType(elemDt), nullable = true)),
          v => elems(v).toVector,
          (a, b) => a.asInstanceOf[Vector[Any]] ++ elems(b),
          a => Seq(a.asInstanceOf[Vector[Any]].distinct))
      case None => f.dataType match {
        // type-based defaults (config.rs:82-90): numbers sum,
        // timestamps keep first + last-as-`_end`, everything else first
        case _: NumericType => numericSum
        case TimestampType | DateType => FieldPlan(idx,
          Seq(f, StructField(f.name + "_end", f.dataType, nullable = true)),
          v => Array[Any](v, v),
          (a, b) => {
            val arr = a.asInstanceOf[Array[Any]]
            if (b == null) arr
            else Array[Any](if (arr(0) == null) b else arr(0), b)
          },
          a => { val arr = a.asInstanceOf[Array[Any]]; Seq(arr(0), arr(1)) })
        case _ => keepFirst
      }
    }
  }

  /** Run the session reduce over a keyed stream of rows. `startsIdx` /
    * `endsIdx` point at pre-staged boolean columns (conditions compile
    * to Columns once, outside the kernel); staged columns named in
    * `exclude` are dropped from the output.
    */
  def run(grouped: KeyValueGroupedDataset[String, Row],
          schema: StructType,
          groupBy: Seq[String],
          strategies: Map[String, Reduce.MergeStrategy],
          exclude: Set[String],
          expireMs: Long,
          maxEvents: Option[Int],
          startsIdx: Option[Int],
          endsIdx: Option[Int],
          countField: String = "n_events"): (Dataset[Row], StructType) = {
    val groupFields = groupBy.filter(g => schema.fieldNames.contains(g))
    val groupIdx = groupFields.map(schema.fieldIndex)
    val plans = schema.fields.zipWithIndex
      .filterNot { case (f, _) =>
        groupFields.contains(f.name) || exclude(f.name) }
      .map { case (f, i) => planFor(f, i, strategies.get(f.name)) }
      .toSeq
    val outSchema = StructType(
      groupFields.map(g => schema(g)) ++
        plans.flatMap(_.outFields) :+
        StructField(countField, LongType, nullable = false))
    implicit val outEnc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    // accumulator = (group col values, per-plan accs, event count);
    // Kryo: the acc values are arbitrary runtime types (strings,
    // numbers, timestamps, vectors) with no product schema
    type A = (Array[Any], Array[Any], Long)
    implicit val encA: Encoder[A] = Encoders.kryo[A]
    val cfg = ReduceSessions.Config[Row, A](
      init = r => (
        groupIdx.map(r.get).toArray,
        plans.map(p => p.init(r.get(p.idx))).toArray,
        1L),
      merge = (a, r) => (
        a._1,
        plans.zip(a._2).map { case (p, acc) => p.merge(acc, r.get(p.idx)) }.toArray,
        a._3 + 1),
      expireAfterMs = expireMs,
      maxEvents = maxEvents,
      startsWhen = startsIdx.map(i => (r: Row) => r.getBoolean(i)),
      endsWhen = endsIdx.map(i => (r: Row) => r.getBoolean(i)))
    val ds = ReduceSessions[String, Row, A, Row](grouped, cfg) { (_, a, _) =>
      Row.fromSeq(
        a._1.toSeq ++
          plans.zip(a._2).flatMap { case (p, acc) => p.finish(acc) } :+
          a._3)
    }
    (ds, outSchema)
  }
}
