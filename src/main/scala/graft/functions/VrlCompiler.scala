package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** Compile VRL source text to Catalyst `Column`s over a typed event
  * DataFrame.
  *
  * Reference semantics: /root/reference/src/transforms/remap.rs:128-155
  * (drop_on_error / drop_on_abort / reroute_dropped — a runtime error in
  * a fallible `f!()` call or an `abort` discards every modification and
  * routes the ORIGINAL event to the `dropped` output) and the expression
  * semantics in website/cue/reference/remap/expressions/ (path
  * assignment, error coalescing `??`, if/else-if/else, blocks).
  *
  * Spark-first design: instead of interpreting the AST per event (the
  * reference compiles VRL to a tree-walking program in the vrl crate),
  * each program is lowered ONCE at plan-build time to native Column
  * expressions — statements become SSA-style column rebindings, `if`
  * branches become `when(...)` merges over the fields each branch
  * touched (a phi node per field), and `abort`/fallible errors become a
  * boolean drop-predicate column. The whole program therefore
  * participates in whole-stage codegen and Catalyst optimization; no
  * per-row interpreter exists at runtime.
  *
  * Semantic mapping notes (documented deviations, all stemming from the
  * "error ≈ null" representation of our function layer):
  *   - a fallible call that fails yields null; `f!()` marks the row
  *     dropped when its result is null
  *   - `a ?? b` compiles to coalesce(a, b) — it also substitutes when
  *     `a` is a legitimate null value, which VRL would keep
  *   - `v, err = f(...)` binds err to a boolean (true = failed) rather
  *     than an error message string
  *   - `del`/`exists` treat null-valued and absent fields alike (a fixed
  *     relational schema has no key-presence distinction)
  */
object VrlCompiler {
  import VrlAst._

  final case class VrlCompileException(msg: String)
      extends RuntimeException(msg)

  /** Named enrichment tables for the VRL lookup functions
    * (get_enrichment_table_record / find_enrichment_table_records):
    * column names + typed rows, registered by the config loader from the
    * `enrichment_tables:` section. Driver-side and broadcast-sized by
    * design — the 100 TB path is [[graft.enrich.EnrichmentTable]]'s join.
    */
  @volatile var enrichmentTables: Map[String, (Seq[String], Seq[Seq[Any]])] =
    Map.empty

  /** `type: geoip` / `type: mmdb` enrichment tables (MaxMind databases,
    * reference src/enrichment_tables/{geoip,mmdb}.rs): VRL lookups on
    * these key on "ip" and compile to a broadcast tree-walk, not an
    * equality map. Registered by the config loader; value = (reader,
    * locale).
    */
  /** memory-table bloom/cuckoo filter variants registered from the
    * `enrichment_tables:` config (values are
    * [[graft.enrich.MemoryFilters.BloomTable]] /
    * [[graft.enrich.MemoryFilters.CuckooTable]]).
    */
  @volatile var filterTables: Map[String, AnyRef] = Map.empty

  @volatile var geoipTables: Map[String, (graft.enrich.Mmdb.Reader, String)] =
    Map.empty

  /** Lightweight type tag threaded through compilation so `+` can pick
    * concat-vs-add and `length` can pick size-vs-strlen statically.
    */
  sealed trait VT
  case object TStr extends VT
  /** regex literal `r'..'` — string-shaped, but regex-ness is observable
    * (tag_types_externally tags it "regex", split treats it as a pattern).
    */
  case object TRegex extends VT
  case object TInt extends VT
  case object TFloat extends VT
  case object TBool extends VT
  case object TTs extends VT
  case object TArr extends VT
  /** heterogeneous array — array<variant> (e.g. `.a[0]=0; .a[1]="1"`);
    * equality compares canonical JSON.
    */
  case object TVarArr extends VT
  case object TMap extends VT
  final case class TObj(st: StructType) extends VT
  /** parse_json output: Spark 4 VariantType — path steps become
    * try_variant_get, casts go through the variant cast rules.
    */
  case object TVariant extends VT
  case object TAny extends VT

  final case class CV(col: Column, t: VT)

  private def vtOf(dt: DataType): VT = dt match {
    case StringType => TStr
    case LongType | IntegerType | ShortType | ByteType => TInt
    case DoubleType | FloatType | _: DecimalType => TFloat
    case BooleanType => TBool
    case TimestampType | TimestampNTZType => TTs
    case s: StructType => TObj(s)
    case ArrayType(VariantType, _) => TVarArr
    case _: ArrayType => TArr
    case _: MapType => TMap
    case VariantType => TVariant
    case _ => TAny
  }

  /** Backtick-quote a column/field name when it isn't a plain identifier
    * (quoted-path fields like `"d.e"` become literal dotted names).
    */
  private def quoteIfNeeded(name: String): String =
    if (name.matches("[A-Za-z_][A-Za-z0-9_]*")) name
    else "`" + name.replace("`", "``") + "`"
  private def colRef(name: String): Column = col(quoteIfNeeded(name))

  /** Compilation result: the output event fields (in stable order),
    * plus separate abort and fallible-error predicates so callers can
    * honor the reference's drop_on_abort / drop_on_error flags
    * independently (remap.rs:128-155).
    */
  final case class Compiled(fields: Seq[(String, Column)],
                            abortCond: Column, errCond: Column,
                            emitN: Option[Column] = None) {
    def dropCond: Column = abortCond || errCond
  }

  /** Environment: event fields + local variables + the drop predicate,
    * all immutable so `if` branches can fork and phi-merge.
    */
  private final case class Env(fields: ListMap[String, CV],
                               vars: Map[String, CV],
                               aborted: Column, errored: Column,
                               emitN: Option[Column] = None,
                               inputSchema: StructType = new StructType()) {
    def withError(c: Column): Env = copy(errored = errored || c)
  }

  /** Resolve a column's Catalyst type at COMPILE time by analyzing a
    * zero-row projection over the input schema — lets `. =` / `|=`
    * accept functions whose Column is a struct even when the VT layer
    * only knows TAny (parse_syslog, parse_apache_log, ...). Returns None
    * when the column references mid-program synthetics the input schema
    * can't resolve.
    */
  private def resolvedType(env: Env, c: Column): Option[DataType] =
    scala.util.Try {
      val spark = org.apache.spark.sql.SparkSession.active
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        env.inputSchema).select(c).schema.head.dataType
    }.toOption

  def compile(schema: StructType, source: String): Compiled = {
    val program = VrlParser.parse(source)
    val init = Env(
      ListMap(schema.fields.map(f => f.name -> CV(colRef(f.name), vtOf(f.dataType))): _*),
      Map.empty,
      lit(false), lit(false), inputSchema = schema)
    val end = program.stmts.foldLeft(init)(stmt)
    Compiled(end.fields.map { case (n, cv) => (n, cv.col) }.toSeq,
      end.aborted, end.errored, end.emitN)
  }

  /** Compile against a DataFrame and split into remap-style outputs:
    * primary = transformed survivors, dropped = ORIGINAL rows that
    * aborted or errored (reference remap.rs:128-155 reroute_dropped).
    */
  def run(df: DataFrame, source: String): graft.operators.Remap.Outputs = {
    val c = compile(df.schema, source)
    val keep = !coalesce(c.dropCond, lit(false))
    graft.operators.Remap.Outputs(primaryOf(df, c, keep), df.filter(!keep))
  }

  private def primaryOf(df: DataFrame, c: Compiled, keep: Column): DataFrame =
    c.emitN match {
      case Some(arr) =>
        // 1→N emit: explode the per-row event array
        df.filter(keep).select(explode(arr).as("__e"))
          .select(c.fields.map { case (n, _) =>
            col("__e").getField(n).as(n)
          }: _*)
      case None =>
        df.filter(keep).select(c.fields.map { case (n, e) => e.as(n) }: _*)
    }

  /** Like [[run]] but honoring the reference remap flags: a predicate
    * that is "off" forwards the affected rows UNMODIFIED on the primary
    * output instead of dropping them (abort always discards the
    * program's modifications; drop_on_abort only decides routing —
    * remap.rs:128-155 and tests/behavior/transforms/remap.yaml
    * remap_abort / remap_abort_drop_on_abort).
    */
  def runWith(df: DataFrame, source: String,
              dropOnError: Boolean, dropOnAbort: Boolean): graft.operators.Remap.Outputs = {
    val c = compile(df.schema, source)
    val transformed = primaryOf(df, c, !coalesce(c.dropCond, lit(false)))
    // a program that can neither abort nor error forwards nothing — skip
    // the union entirely so type-CHANGING programs (e.g. `.a` string →
    // array) don't force a lossy column-type coercion
    if (isLitFalse(c.abortCond) && isLitFalse(c.errCond))
      graft.operators.Remap.Outputs(transformed, df.filter(lit(false)))
    else {
      val affected = coalesce(c.dropCond, lit(false))
      val dropped = coalesce(
        (if (dropOnAbort) c.abortCond else lit(false)) ||
          (if (dropOnError) c.errCond else lit(false)), lit(false))
      val forwarded = df.filter(affected && !dropped)
      // align the forwarded (original-typed) rows to the transformed
      // schema: same-type columns pass through, castable ones try_cast,
      // incompatible ones go null, missing ones go null — a union of
      // heterogeneous events needs ONE schema and the program's output
      // shape wins
      val tSchema = transformed.schema
      val fTypes = forwarded.schema.fields.map(f => f.name -> f.dataType).toMap
      val aligned = forwarded.select(tSchema.fields.toSeq.map { f =>
        val src = fTypes.get(f.name) match {
          case Some(dt) if dt == f.dataType => colRef(f.name)
          case Some(dt) if org.apache.spark.sql.catalyst.expressions.Cast
            .canCast(dt, f.dataType) => colRef(f.name).try_cast(f.dataType)
          case _ => lit(null).cast(f.dataType)
        }
        src.as(f.name)
      }: _*)
      graft.operators.Remap.Outputs(
        transformed.union(aligned), df.filter(dropped))
    }
  }

  /** Statically-false predicate (an untouched `lit(false)` slot). */
  private def isLitFalse(c: Column): Boolean =
    org.apache.spark.sql.graft.ColumnBridge.expression(c) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(false, BooleanType) => true
      case _ => false
    }

  /** Compile a VRL boolean condition (`condition.type: vrl` in filter /
    * route / unit-test configs, src/conditions/vrl.rs): the program's
    * final expression is the predicate; leading statements (variable
    * bindings etc.) are allowed, field/var assignments take no effect
    * outside the condition.
    */
  def condition(schema: StructType, source: String): Column = {
    val program = VrlParser.parse(source)
    val init = Env(
      ListMap(schema.fields.map(f => f.name -> CV(colRef(f.name), vtOf(f.dataType))): _*),
      Map.empty,
      lit(false), lit(false))
    val (end, v) = block(init, Block(program.stmts))
    // a failed assert!/assert_eq! or abort in a LEADING statement fails
    // the condition even though the final expression is the value
    // (src/conditions/vrl.rs: any runtime error -> condition false)
    coalesce(v.col, lit(false)) &&
      !coalesce(end.errored, lit(false)) && !coalesce(end.aborted, lit(false))
  }

  // ---------------- statements ----------------

  private def stmt(env: Env, s: Stmt): Env = s match {
    case AbortS(_) => env.copy(aborted = lit(true))

    // parser-desugared chained assignment — apply in order
    case SeqS(ss) => ss.foldLeft(env)(stmt)

    // secrets live in a `__secrets` map column alongside the event
    // (reference: §1.4 event metadata/secrets, vector-vrl/functions/src/
    // set_secret.rs) — set/remove rebind the map, get reads it
    case ExprStmt(CallE("set_secret", _, List(k, v), _, None, _)) =>
      val (kv, _) = expr(env, k)
      val (vv, _) = expr(env, v)
      val cur = env.fields.get("__secrets").map(_.col)
        .getOrElse(typedLit(Map.empty[String, String]))
      env.copy(fields = env.fields +
        ("__secrets" -> CV(map_concat(
          map_filter(cur, (mk, _) => !(mk <=> kv.col)),
          map(kv.col, vv.col.cast("string"))), TMap)))
    case ExprStmt(CallE("remove_secret", _, List(k), _, None, _)) =>
      env.fields.get("__secrets") match {
        case Some(s) =>
          val (kv, _) = expr(env, k)
          env.copy(fields = env.fields +
            ("__secrets" -> CV(
              map_filter(s.col, (mk, _) => !(mk <=> kv.col)), TMap)))
        case None => env
      }

    // for_each(collection) -> |k, v| { acc = acc + … }: the reference
    // iterates the closure per element, mutating enclosing-scope
    // variables (closure.cue / the vrl stdlib's for_each). Compiled to a
    // Catalyst `aggregate` HOF whose accumulator is a struct of every
    // enclosing variable the body assigns — the loop runs inside
    // whole-stage codegen, no per-row interpreter. Event-field
    // assignment inside the body has no Column form and is rejected.
    case ExprStmt(CallE("for_each", _, List(target), _, Some(cl), _)) =>
      val (tv, tErr) = expr(env, target)
      val acc = assignedVars(cl.body).filter(env.vars.contains).toList.sorted
      if (assignedFields(cl.body).nonEmpty)
        throw VrlCompileException(
          "for_each: event-field assignment inside the closure is not supported; accumulate into variables")
      val env1 = tErr.foldLeft(env)((e, c) => e.withError(c))
      if (acc.isEmpty) env1
      else {
        // normalize: arrays iterate as (index, value), maps as (key, value)
        val items = tv.t match {
          case TMap => map_entries(tv.col)
          case _ => transform(tv.col,
            (x, i) => struct(i.cast("long").as("key"), x.as("value")))
        }
        val init = struct(acc.map(n => env.vars(n).col.as(n)): _*)
        val kT = if (tv.t == TMap) TStr else TInt
        val folded = aggregate(items, init, (a, elem) => {
          val bound = acc.map(n => n -> CV(a.getField(n), env.vars(n).t)) ++
            (cl.params match {
              case List(k, v) => List(
                k -> CV(elem.getField("key"), kT),
                v -> CV(elem.getField("value"), TAny))
              case List(v) => List(v -> CV(elem.getField("value"), TAny))
              case ps => throw VrlCompileException(
                s"for_each: closure takes 1 or 2 params, got ${ps.length}")
            })
          val end = block(env.copy(vars = env.vars ++ bound), cl.body)._1
          struct(acc.map(n => end.vars(n).col.as(n)): _*)
        })
        env1.copy(vars = env1.vars ++
          acc.map(n => n -> CV(folded.getField(n), env.vars(n).t)))
      }

    // `v = del(.f)` — read-and-remove (del.cue returns the deleted
    // value); field removal falls through to dynamic-root key removal
    case Assign(t, None, CallE("del", _, List(p @ PathE(FieldSeg(f) :: Nil)), _, _, _))
        if !t.isInstanceOf[PathT] || t.asInstanceOf[PathT].segs.nonEmpty =>
      val (v, _) = expr(env, p)
      val env1 =
        if (env.fields.contains(f)) env.copy(fields = env.fields - f)
        else env.fields.get("__root_map") match {
          case Some(m) => env.copy(fields = env.fields +
            ("__root_map" -> CV(Vrl.variantRemoveKey(m.col, f), m.t)))
          case None => env
        }
      assign(env1, t, v)

    // `. |= expr` — shallow merge into the whole event
    // (assignment.cue's merge-assignment; config/examples use it for
    // `. |= parse_apache_log!(...)` and wrapped-JSON traversal)
    case MergeAssign(PathT(Nil), errT, value) =>
      if (errT.isDefined) throw VrlCompileException(
        "`., err |= …` is not supported on the event root; use `. |= …`")
      val (v0, errCond) = expr(env, value)
      val env1 = errCond.foldLeft(env)((e, c) => e.withError(c))
      val needResolve = v0.t match {
        case TAny => true
        case TObj(st) => st.fields.isEmpty
        case _ => false
      }
      val v =
        if (!needResolve) v0
        else resolvedType(env1, v0.col) match {
          case Some(st: StructType) if st.fields.nonEmpty => CV(v0.col, TObj(st))
          case Some(_: MapType) => CV(v0.col, TMap)
          case Some(VariantType) => CV(v0.col, TVariant)
          case _ => v0
        }
      v.t match {
        case TObj(st) =>
          // static shallow merge: RHS keys override in place, new keys
          // append (keeps output column order stable)
          val updated = env1.fields.toSeq.map { case (n, cv) =>
            st.fields.find(_.name == n) match {
              case Some(fd) => n -> CV(v.col.getField(n), vtOf(fd.dataType))
              case None => n -> cv
            }
          }
          val appended = st.fields.toSeq
            .filterNot(fd => env1.fields.contains(fd.name))
            .map(fd => fd.name -> CV(v.col.getField(fd.name), vtOf(fd.dataType)))
          env1.copy(fields = ListMap((updated ++ appended): _*))
        case TMap | TVariant =>
          // dynamic merge: JSON-bridge the current event, merge keys,
          // keep the event dynamic (reads fall back to __root_map)
          val lhs: Column = env1.fields.get("__root_map") match {
            case Some(m) => m.col
            case None => struct(env1.fields.map {
              case (n, cv) => cv.col.as(n) }.toSeq: _*)
          }
          env1.copy(fields = ListMap("__root_map" ->
            CV(Vrl.mergeVariant(lhs, v.col, deep = false), TVariant)))
        case _ => throw VrlCompileException(
          "`. |= …` needs an object-shaped right-hand side")
      }

    // non-root `target |= expr` desugars to target = merge(target, expr)
    case MergeAssign(t, errT, value) =>
      val lhsExpr: Expr = t match {
        case PathT(segs) => PathE(segs)
        case VarT(n) => VarE(n)
        case MetaT => MetaE
      }
      stmt(env, Assign(t, errT, MergeWrapE(lhsExpr, value)))

    // whole-event replacement `. = …` (remap.rs: assigning an ARRAY to
    // the root emits one event per element — the 1→N remap path)
    case Assign(PathT(Nil), _, value) =>
      if (env.emitN.isDefined)
        throw VrlCompileException("only one `. =` root assignment is supported")
      value match {
        // `. = unnest(.f)`: one event per element of .f, all other
        // fields copied (unnest.cue) — compiles to a transform-to-array
        // + the explode in primaryOf; element schema resolves in
        // Catalyst analysis, so no static element type is needed
        case CallE("unnest", _, List(p @ PathE(FieldSeg(f) :: Nil)), _, None, _) =>
          val (arr, _) = expr(env, p)
          val others = env.fields.toSeq.filter(_._1 != f)
          val emit = transform(arr.col, x =>
            struct((others.map { case (n, cv) => cv.col.as(n) } :+
              x.as(f)): _*))
          // in-place rebind (ListMap `+` on an existing key re-appends
          // at the end, which would reorder the output columns)
          env.copy(
            fields = ListMap(env.fields.toSeq.map { case (n, cv) =>
              if (n == f) n -> CV(lit(null), TAny) else n -> cv }: _*),
            emitN = Some(emit))
        case CallE("unnest", _, _, _, _, _) =>
          throw VrlCompileException(
            "unnest: target must be a root-level field path")
        case ObjectE(fs) =>
          val compiled = fs.map { case (k, v) => k -> expr(env, v)._1 }
          env.copy(fields = ListMap(compiled: _*))
        case ArrayE(items) if items.nonEmpty && items.forall(_.isInstanceOf[ObjectE]) =>
          val objs = items.collect { case o: ObjectE => o }
          val keys = objs.flatMap(_.fields.map(_._1)).distinct
          val structs = objs.map { o =>
            val m = o.fields.toMap
            struct(keys.map(k => m.get(k)
              .map(e => expr(env, e)._1.col)
              .getOrElse(lit(null)).as(k)): _*)
          }
          env.copy(
            fields = ListMap(keys.map(k => k -> CV(lit(null), TAny)): _*),
            emitN = Some(array(structs: _*)))
        case other =>
          // general whole-event replacement (remap.yaml remap_mapped_scalars,
          // remap_function_parse_regex, remap_function_parse_key_value):
          //  - scalar value -> a log event with the scalar under `message`
          //  - struct of KNOWN schema -> its fields become the event
          //  - map -> a dynamic event; kept as `__root_map`, path reads
          //    fall back to element_at so downstream conditions resolve
          val (v, errCond) = expr(env, other)
          val env1 = errCond.foldLeft(env)((e, c) => e.withError(c))
          v.t match {
            case TObj(st) if st.fields.nonEmpty =>
              env1.copy(fields = ListMap(st.fields.toSeq.map(f =>
                f.name -> CV(v.col.getField(f.name), vtOf(f.dataType))): _*))
            case TMap | TVariant =>
              env1.copy(fields = ListMap("__root_map" -> v))
            case TStr | TRegex | TInt | TFloat | TBool | TTs =>
              // the marker lets a later `.` read the scalar back (the
              // reference keeps scalar events scalar mid-pipeline;
              // `message` is the log-boundary rendering)
              env1.copy(fields = ListMap("message" -> v,
                "__root_scalar" -> CV(lit(true), TBool)))
            case _ =>
              // TAny: ask Catalyst what the column actually is (covers
              // struct-building parse_* functions typed TAny)
              resolvedType(env1, v.col) match {
                case Some(st: StructType) if st.fields.nonEmpty =>
                  env1.copy(fields = ListMap(st.fields.toSeq.map(f =>
                    f.name -> CV(v.col.getField(f.name), vtOf(f.dataType))): _*))
                case Some(_: MapType) =>
                  env1.copy(fields = ListMap("__root_map" ->
                    CV(v.col, TMap)))
                case Some(VariantType) =>
                  env1.copy(fields = ListMap("__root_map" ->
                    CV(v.col, TVariant)))
                case Some(StringType | LongType | IntegerType | DoubleType |
                          FloatType | BooleanType | TimestampType) =>
                  env1.copy(fields = ListMap("message" -> v,
                    "__root_scalar" -> CV(lit(true), TBool)))
                case _ => throw VrlCompileException(
                  "`. =` needs a scalar, a schema-known object, a map, or literals")
              }
          }
      }

    case Assign(_, _, _) if env.emitN.isDefined =>
      throw VrlCompileException("no assignments may follow a `. = [..]` emit")

    case Assign(target, errT, value) =>
      val (v, errCond) = expr(env, value)
      errT match {
        case None =>
          // a bang-call error drops the row (drop_on_error) — the
          // statement doesn't capture it
          errCond.foldLeft(assign(env, target, v))((e, c) => e.withError(c))
        case Some(et) =>
          // `v, err = …` is infallible (assignment.cue): on failure the
          // target gets the expression type's DEFAULT value (0 / 0.0 /
          // "" / false / null) and err gets the error MESSAGE; on
          // success err is null (remap_infallible_assignment,
          // remap_arithmetic_error `.a == 0.0`)
          val fallible: Option[(Column, Column)] = value match {
            case c: CallE =>
              val cond = errCond.map(_ || v.col.isNull).getOrElse(v.col.isNull)
              Some(cond -> callErrMsg(env, c))
            case BinE(op, _, _) if Set("+", "-", "*", "/", "%")(op) =>
              val cond = errCond.map(_ || v.col.isNull).getOrElse(v.col.isNull)
              Some(cond -> lit(s"arithmetic error for operator \"$op\""))
            case _ => errCond.map(c =>
              c -> lit("runtime error"))
          }
          val (vSafe, errVal) = fallible match {
            case Some((fc, msg)) =>
              val cond = coalesce(fc, lit(false))
              (CV(when(cond, defaultOf(v.t)).otherwise(v.col), v.t),
                when(cond, msg).otherwise(lit(null).cast("string")))
            case None => (v, lit(null).cast("string"))
          }
          assign(assign(env, target, vSafe), et, CV(errVal, TStr))
      }

    case ExprStmt(IfE(branches, elseB)) => compileIf(env, branches, elseB)._1

    case ExprStmt(CallE("del", _, List(PathE(FieldSeg(f) :: Nil)), _, _, _)) =>
      env.copy(fields = env.fields - f)

    case ExprStmt(e) =>
      val (_, errCond) = expr(env, e)
      errCond.foldLeft(env)((en, c) => en.withError(c))
  }

  /** Variables a block (transitively) assigns — the for_each accumulator set. */
  private def assignedVars(b: Block): Set[String] = b.stmts.flatMap {
    case Assign(VarT(n), errT, _) =>
      Seq(n) ++ errT.collect { case VarT(e) => e }
    case ExprStmt(IfE(br, eb)) =>
      br.flatMap(a => assignedVars(a._2)) ++ eb.toSeq.flatMap(assignedVars)
    case _ => Nil
  }.toSet

  private def assignedFields(b: Block): Set[String] = b.stmts.flatMap {
    case Assign(PathT(FieldSeg(f) :: _), _, _) => Seq(f)
    case ExprStmt(IfE(br, eb)) =>
      br.flatMap(a => assignedFields(a._2)) ++ eb.toSeq.flatMap(assignedFields)
    case _ => Nil
  }.toSet

  private def assign(env: Env, t: Target, v: CV): Env = t match {
    case VarT(name) => env.copy(vars = env.vars + (name -> v))
    // `%` metadata root — carried as a __metadata event field
    // (vrl_test_input.yaml `%  = "Metadata"`)
    case MetaT => env.copy(fields = env.fields + ("__metadata" -> v))
    case PathT(FieldSeg(f) :: Nil) => env.copy(fields = env.fields + (f -> v))
    case PathT(FieldSeg(f) :: rest)
        if rest.forall(_.isInstanceOf[FieldSeg]) =>
      // nested path assignment: withField into the existing struct, or
      // a fresh struct when the base is absent / not a struct
      val path = rest.collect { case FieldSeg(n) => n }
      val base = env.fields.get(f)
      val updated = base match {
        case Some(CV(c, TObj(st))) =>
          var col0 = c
          col0 = col0.withField(path.map(quoteIfNeeded).mkString("."), v.col)
          CV(col0, TObj(st)) // struct type changed; TObj kept for walk
        case _ =>
          // build struct({...}) bottom-up for a missing base
          val nested = path.init.foldRight(struct(v.col.as(path.last))) {
            (seg, inner) => struct(inner.as(seg))
          }
          // TObj marker (schema unknown pre-analysis) so a later nested
          // assignment withFields into this struct instead of replacing it
          CV(nested, TObj(StructType(Nil)))
      }
      env.copy(fields = env.fields + (f -> updated))
    case PathT(FieldSeg(f) :: IndexSeg(i) :: Nil) =>
      // index assignment `.a[2] = v` (remap.yaml remap_array): the array
      // grows to i+1 with null fill; elements are VARIANT so mixed types
      // coexist (`[0, "1", 2.0]`) — all inside codegen'd HOFs
      val updated = arraySet(env.fields.get(f), i, v)
      env.copy(fields = env.fields + (f -> updated))
    case PathT(segs) =>
      throw VrlCompileException(s"unsupported assignment target: $segs")
  }

  /** Set element `i` of a (possibly absent) array, null-filling up to it;
    * element type is variant so heterogeneous assignments compose.
    */
  private def arraySet(base: Option[CV], i: Int, v: CV): CV = {
    val arr = base match {
      case Some(CV(c, TVarArr)) => c
      case Some(CV(c, TArr)) => transform(c, e => e.cast(VariantType))
      case _ => lit(null).cast(ArrayType(VariantType))
    }
    val vv = v.col.cast(VariantType)
    val curLen = coalesce(array_size(arr), lit(0))
    val newLen = greatest(curLen, lit(i + 1))
    CV(transform(sequence(lit(0), newLen - 1),
      j => when(j === i, vv).otherwise(try_element_at(arr, j + 1))), TVarArr)
  }

  /** VRL default value per type — what `v, err =` assigns on failure. */
  private def defaultOf(t: VT): Column = t match {
    case TInt => lit(0L)
    case TFloat => lit(0.0)
    case TStr | TRegex => lit("")
    case TBool => lit(false)
    case _ => lit(null)
  }

  /** The reference's runtime error text for a failed call:
    * `function call error for "f" at (start:end): <inner>` — the span is
    * byte offsets into the program source (remap_infallible_assignment
    * asserts this exact shape).
    */
  private def callErrMsg(env: Env, c: CallE): Column = {
    val prefix = s"""function call error for "${c.name}" at (${c.span._1}:${c.span._2}): """
    val inner: Column = c.name match {
      case "parse_json" =>
        val (av, _) = expr(env, c.args.head)
        Vrl.jsonParseError(av.col.cast("string"))
      case "validate_json_schema" =>
        // rebuild the detailed error from the same compile-time schema
        // literal the main lowering used (0.50 release-notes semantics:
        // the collected validation errors ride the error channel)
        val pathLit = (c.args.lift(1).toList ++
          c.named.collect { case ("schema_definition", e) => e }).collectFirst {
            case VrlAst.LitS(s) => s }
        val ignore = (c.args.lift(2).toList ++
          c.named.collect { case ("ignore_unknown_formats", e) => e })
          .collectFirst { case VrlAst.LitB(b) => b }.getOrElse(false)
        pathLit match {
          case Some(p) =>
            val schemaJson = new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(p)), "UTF-8")
            val (av, _) = expr(env, c.args.head)
            Vrl.validateJsonSchemaErr(av.col.cast("string"), schemaJson, ignore)
          case None => lit("function call failed")
        }
      case _ => lit("function call failed")
    }
    concat(lit(prefix), coalesce(inner, lit("function call failed")))
  }

  /** if/else-if/else: compile each block against the pre-branch env,
    * then phi-merge every field/var/drop slot the branches changed.
    * Returns (merged env, value of the if-expression).
    */
  private def compileIf(env: Env, branches: List[(Expr, Block)],
                        elseB: Option[Block]): (Env, CV) = {
    // conditions evaluate in order, THREADING env effects between them
    // (if.cue "Multiline expression": `if (x = x + 1; x == 5) {} else
    // if (x = x + 1; x == 5) {}` — the second predicate sees the first
    // one's increment); each arm body sees the env as of its predicate
    var condEnv = env
    val condArms = branches.map { case (c, b) =>
      val (cv, envAfter) = c match {
        case blk: BlockE =>
          val (e2, v) = block(condEnv, blk.b); (v, e2)
        case other => (expr(condEnv, other)._1, condEnv)
      }
      condEnv = envAfter
      (cv.col, block(condEnv, b))
    }
    val conds = condArms.map(_._1)
    val arms = condArms.map(_._2)
    val elseArm = elseB.map(b => block(condEnv, b))

    def phi(sel: Env => Map[String, CV], keys: Iterable[String]): Map[String, CV] =
      keys.map { k =>
        val origOpt = sel(env).get(k)
        val armVals = arms.map(a => sel(a._1).get(k))
        val elseVal = elseArm.map(a => sel(a._1).get(k)).getOrElse(origOpt)
        val allSame = armVals.forall(av =>
          av.zip(origOpt).exists { case (a, o) => a.col eq o.col }) &&
          elseVal.zip(origOpt).exists { case (a, o) => a.col eq o.col }
        if (allSame && origOpt.isDefined) k -> origOpt.get
        else {
          val nullCv = CV(lit(null), TAny)
          val merged = conds.zip(armVals).foldRight(
            elseVal.orElse(origOpt).getOrElse(nullCv).col) {
            case ((c, av), acc) =>
              when(coalesce(c, lit(false)), av.orElse(origOpt).getOrElse(nullCv).col)
                .otherwise(acc)
          }
          val t = armVals.flatten.headOption.map(_.t)
            .orElse(origOpt.map(_.t)).getOrElse(TAny)
          k -> CV(merged, t)
        }
      }.toMap

    val fieldKeys = (env.fields.keys ++ arms.flatMap(_._1.fields.keys) ++
      elseArm.toList.flatMap(_._1.fields.keys)).toList.distinct
    val varKeys = (env.vars.keys ++ arms.flatMap(_._1.vars.keys) ++
      elseArm.toList.flatMap(_._1.vars.keys)).toList.distinct

    val mergedFields = phi(_.fields, fieldKeys)
    val mergedVars = phi(_.vars, varKeys)

    def mergeCond(sel: Env => Column): Column =
      conds.zip(arms.map(a => sel(a._1))).foldRight(
        elseArm.map(a => sel(a._1)).getOrElse(sel(env))) {
        case ((c, d), acc) => when(coalesce(c, lit(false)), d).otherwise(acc)
      }
    val mergedAbort = mergeCond(_.aborted)
    val mergedError = mergeCond(_.errored)

    // preserve original field ordering, append new fields in first-seen order
    val orderedFields = ListMap(fieldKeys.map(k => k -> mergedFields(k)): _*)

    val value = {
      val armVs = arms.map(_._2)
      val elseV = elseArm.map(_._2).getOrElse(CV(lit(null), TAny))
      val c = conds.zip(armVs).foldRight(elseV.col) { case ((c0, v), acc) =>
        when(coalesce(c0, lit(false)), v.col).otherwise(acc)
      }
      CV(c, armVs.headOption.map(_.t).getOrElse(TAny))
    }

    (Env(orderedFields, mergedVars, mergedAbort, mergedError), value)
  }

  /** A block evaluates its statements in order; its value is the value
    * of the final expression statement (block.cue).
    */
  private def block(env: Env, b: Block): (Env, CV) = {
    // an assignment's value is the assigned value (assignment.cue:
    // `.my_field = my_variable` as a final statement returns it; so
    // does `x |= {..}`) — read the target back from the post-stmt env
    def targetValue(e2: Env, t: Target): CV = t match {
      case PathT(segs) => expr(e2, PathE(segs))._1
      case VarT(n0) => expr(e2, VarE(n0))._1
      case MetaT => expr(e2, MetaE)._1
    }
    var cur = env
    var last = CV(lit(null), TAny)
    b.stmts.foreach {
      case ExprStmt(IfE(br, eb)) =>
        val (e2, v) = compileIf(cur, br, eb)
        cur = e2; last = v
      case ExprStmt(e) =>
        val (v, errCond) = expr(cur, e)
        cur = errCond.foldLeft(cur)((en, c) => en.withError(c))
        last = v
      case a @ Assign(t, _, _) =>
        cur = stmt(cur, a)
        last = targetValue(cur, t)
      case m @ MergeAssign(t, _, _) =>
        cur = stmt(cur, m)
        last = targetValue(cur, t)
      case sq @ SeqS(ss) =>
        cur = stmt(cur, sq)
        // chain desugar assigns the innermost target first — its value
        // is the chain's value
        last = ss.headOption match {
          case Some(Assign(t, _, _)) => targetValue(cur, t)
          case _ => CV(lit(null), TAny)
        }
      case other =>
        cur = stmt(cur, other)
        last = CV(lit(null), TAny)
    }
    (cur, last)
  }

  // ---------------- expressions ----------------

  /** Returns (value, optional fallible-error condition from `f!()`). */
  private def expr(env: Env, e: Expr): (CV, Option[Column]) = e match {
    case LitS(v) => (CV(lit(v), TStr), None)
    case LitR(v) => (CV(lit(v), TRegex), None)
    case LitT(v) =>
      // timestamp literal: resolve to an instant at COMPILE time so
      // comparisons are absolute-time, not lexical (comparison.cue)
      val inst =
        try java.time.OffsetDateTime.parse(v).toInstant
        catch { case _: Exception =>
          try java.time.Instant.parse(v)
          catch { case _: Exception =>
            java.time.LocalDateTime.parse(v)
              .toInstant(java.time.ZoneOffset.UTC) } }
      (CV(lit(java.sql.Timestamp.from(inst)), TTs), None)
    case LitI(v) => (CV(lit(v), TInt), None)
    case LitF(v) => (CV(lit(v), TFloat), None)
    case LitB(v) => (CV(lit(v), TBool), None)
    case LitNull => (CV(lit(null), TAny), None)

    case PathE(Nil) =>
      // whole-event `.` — a SCALAR event (from `. = 5`-style assignment)
      // reads back as its value; otherwise a struct of current fields
      env.fields.get("__root_scalar") match {
        case Some(_) =>
          (env.fields.getOrElse("message", CV(lit(null), TAny)), None)
        case None =>
          (CV(struct(env.fields.map { case (n, cv) => cv.col.as(n) }.toSeq: _*),
            TAny), None)
      }

    case MergeWrapE(l, r) =>
      val (lv, e1) = expr(env, l)
      val (rv, e2) = expr(env, r)
      (mergeCV(env, lv, rv), (e1.toSeq ++ e2.toSeq).reduceOption(_ || _))

    case MetaE =>
      // unset metadata root reads as an EMPTY OBJECT (path.cue "Root
      // metadata path": `%` returns {}), and field reads miss to null
      (env.fields.getOrElse("__metadata",
        CV(from_json(lit("{}"), MapType(StringType, StringType)), TMap)), None)

    case PathE(FieldSeg(f) :: rest) =>
      env.fields.get(f) match {
        case Some(cv) => (walk(cv, rest), None)
        case None => env.fields.get("__root_map") match {
          // dynamic event from `. = <map|variant>` — reads resolve
          // through the stored value (element_at for maps,
          // try_variant_get for variants)
          case Some(m) =>
            val base = m.t match {
              case TVariant => walk(m, FieldSeg(f) :: Nil)
              case _ => CV(element_at(m.col, f), TAny)
            }
            (walk(base, rest), None)
          case None => (CV(lit(null), TAny), None)
        }
      }

    case PathE(segs) =>
      throw VrlCompileException(s"unsupported path shape: $segs")

    case VarE(name) =>
      env.vars.get(name) match {
        case Some(cv) => (cv, None)
        case None =>
          throw VrlCompileException(s"undefined variable: $name")
      }

    case AccessE(inner, segs) =>
      val (cv, err) = expr(env, inner)
      (walk(cv, segs), err)

    case ArrayE(items) =>
      val parts = items.map(i => expr(env, i))
      val ts = parts.map(_._1.t)
      val err = parts.flatMap(_._2).reduceOption(_ || _)
      val distinctTs = ts.filterNot(_ == TAny).distinct
      if (distinctTs.length <= 1)
        (CV(array(parts.map(_._1.col): _*),
          if (distinctTs.headOption.contains(TVariant)) TVarArr else TArr), err)
      else if (distinctTs.forall(t => t == TInt || t == TFloat))
        (CV(array(parts.map(_._1.col.cast("double")): _*), TArr), err)
      else
        // heterogeneous literal array (`[0, "1", 2.0]`): array<variant>
        (CV(array(parts.map(_._1.col.cast(VariantType)): _*), TVarArr), err)

    case ObjectE(fields) =>
      val parts = fields.map { case (n, v) => (n, expr(env, v)) }
      (CV(struct(parts.map { case (n, (cv, _)) => cv.col.as(n) }: _*),
        TObj(StructType(Nil))),
        parts.flatMap(_._2._2).reduceOption(_ || _))

    case IfE(branches, elseB) =>
      // expression-position if: env effects inside branches are local
      // phi-merges; the value is the merged branch value
      (compileIf(env, branches, elseB)._2, None)

    case BlockE(b) =>
      // expression-position block (block.cue): statements run in a local
      // scope copy; the value is the final expression's value. A
      // bang-call error inside propagates (the enclosing statement's
      // drop_on_error semantics), surfaced iff the block changed it.
      val (env2, v) = block(env, b)
      (v, if (env2.errored eq env.errored) None else Some(env2.errored))

    case UnE("!", inner) =>
      val (cv, err) = expr(env, inner)
      (CV(!cv.col, TBool), err)
    case UnE("-", inner) =>
      val (cv, err) = expr(env, inner)
      (CV(negate(cv.col), cv.t), err)
    case UnE(op, _) => throw VrlCompileException(s"unknown unary op $op")

    case BinE(op, l, r) =>
      val (lv, le) = expr(env, l)
      val (rv, re) = expr(env, r)
      val err = (le, re) match {
        case (Some(a), Some(b)) => Some(a || b)
        case (a, b) => a.orElse(b)
      }
      (binop(op, lv, rv), err)

    case CallE("match_datadog_query", _, List(_, q), _, None, _) =>
      // Datadog search syntax over the event (conditions layer §2.2):
      // facets bind to the CURRENT field environment, bare terms match
      // the `message` field (or the event's first string field)
      val query = litOf(q) match {
        case Some(s: String) => s
        case _ => throw VrlCompileException(
          "match_datadog_query: query must be a string literal")
      }
      val fieldMap = env.fields.map { case (n, cv) => n -> cv.col }.toMap
      val default = env.fields.get("message")
        .orElse(env.fields.collectFirst { case (_, cv) if cv.t == TStr => cv })
        .map(_.col).getOrElse(lit(""))
      (CV(DatadogSearch(fieldMap, default).compile(query), TBool), None)

    case CallE("tag_types_externally", _, List(argAst), _, None, _) =>
      // recursive external type tagging (tag_types_externally.cue): leaves
      // wrap as {"<type>": value}; objects/arrays tag their leaves. The
      // recursion happens over the literal AST at compile time.
      val errs = List.newBuilder[Column]
      def leaf(cv: CV): Column = {
        val tag = cv.t match {
          case TStr => "string"
          case TRegex => "regex"
          case TInt => "integer"
          case TFloat => "float"
          case TBool => "boolean"
          case TTs => "timestamp"
          case TArr | TVarArr => "array"
          case _ => "object"
        }
        struct(cv.col.as(tag))
      }
      def tagOf(e2: Expr): Column = e2 match {
        case LitNull => lit(null)
        case ObjectE(fs) =>
          struct(fs.map { case (k, v) => tagOf(v).as(k) }: _*)
        case ArrayE(items) => array(items.map(tagOf): _*)
        case other =>
          val (cv, err) = expr(env, other)
          err.foreach(errs += _)
          if (cv.t == TAny) lit(null) else leaf(cv)
      }
      val out = tagOf(argAst)
      (CV(out, TObj(StructType(Nil))), errs.result().reduceOption(_ || _))

    case CallE(fn @ ("get_enrichment_table_record" | "find_enrichment_table_records"),
               _, List(tbl, ObjectE(conds)), named, None, _) =>
      // enrichment-table VRL functions (enrichment.cue; reference
      // src/enrichment_tables/). The scale path is a broadcast join
      // (graft.enrich.EnrichmentTable); HERE the table is a small
      // driver-registered literal (behavior-test `enrichment_tables:`
      // section), so the lookup compiles to a broadcast-sized map literal
      // keyed on the condition fields — still pure Column code.
      val tname = litOf(tbl) match {
        case Some(s: String) => s
        case _ => throw VrlCompileException(s"$fn: table must be a string literal")
      }
      if (filterTables.contains(tname)) {
        // memory table bloom/cuckoo variants (bloom_table.rs /
        // cuckoo_table.rs find_table_rows): exactly one Equals
        // condition; a hit is {key, value: null} (cuckoo adds the
        // uppercase-hex fingerprint); a miss is no row (null here)
        if (conds.length != 1) throw VrlCompileException(
          s"$fn: memory filter tables take exactly one condition")
        val (kv, kerr) = expr(env, conds.head._2)
        val key = kv.col.cast("string")
        import graft.enrich.MemoryFilters
        val (hit, row, st) = filterTables(tname) match {
          case bt: MemoryFilters.BloomTable =>
            (MemoryFilters.bloomMember(key, bt),
              struct(key.as("key"), lit(null).cast("string").as("value")),
              StructType(Seq(StructField("key", StringType),
                StructField("value", StringType))))
          case ct: MemoryFilters.CuckooTable =>
            // fp -> buckets-containing-it map (≤ 2^fingerprint_bits
            // entries, a broadcast-sized literal)
            val byFp = ct.entries.groupBy(_._2)
            val fpMod = lit((1L << ct.fingerprintBits) - 1)
            val fpCol = (pmod(
              conv(substring(md5(concat(lit("fp:"), key)), 1, 8), 16, 10)
                .cast("long"), fpMod).cast("int") + 1)
            val b1 = pmod(
              conv(substring(md5(key), 1, 8), 16, 10).cast("long"),
              lit(ct.nBuckets.toLong)).cast("int")
            val b2 = b1.bitwiseXOR(element_at(
              map((1 to ((1 << ct.fingerprintBits) - 1)).flatMap { fp =>
                Seq(lit(fp), lit(ct.altXorOf(fp)))
              }: _*), fpCol)).bitwiseAND(lit(ct.nBuckets - 1))
            val member =
              if (byFp.isEmpty) lit(false)
              else coalesce(exists(element_at(
                  map(byFp.toSeq.sortBy(_._1).flatMap { case (fp, es) =>
                    Seq(lit(fp), array(es.map(e => lit(e._1)): _*))
                  }: _*), fpCol),
                bkt => bkt === b1 || bkt === b2), lit(false))
            (member,
              struct(key.as("key"),
                upper(conv(fpCol.cast("string"), 10, 16)).as("fingerprint"),
                lit(null).cast("string").as("value")),
              StructType(Seq(StructField("key", StringType),
                StructField("fingerprint", StringType),
                StructField("value", StringType))))
          case kv: graft.enrich.MemoryKv =>
            // exact kv form (table.rs as_object_map): hit row is
            // {key, value, ttl}; the lookup binds a SNAPSHOT of the live
            // store at plan build (flush-interval analogue). Values are
            // stored JSON — surfaced as variant so heterogeneous entries
            // coexist in one literal map.
            val snap = kv.snapshot()
            val entries = snap.flatMap { case (k, vj, ttl) =>
              Seq(lit(k), struct(lit(k).as("key"),
                try_parse_json(lit(vj)).as("value"),
                lit(ttl).as("ttl")))
            }
            if (snap.isEmpty)
              (lit(false),
                struct(key.as("key"),
                  lit(null).cast(VariantType).as("value"),
                  lit(null).cast("long").as("ttl")),
                StructType(Seq(StructField("key", StringType),
                  StructField("value", VariantType),
                  StructField("ttl", LongType))))
            else {
              val m = map(entries: _*)
              (element_at(m, key).isNotNull,
                element_at(m, key),
                StructType(Seq(StructField("key", StringType),
                  StructField("value", VariantType),
                  StructField("ttl", LongType))))
            }
          case other => throw VrlCompileException(
            s"$fn: unsupported filter table $other")
        }
        val looked = when(coalesce(hit, lit(false)), row)
        if (fn == "get_enrichment_table_record")
          (CV(looked, TObj(st)), kerr)
        else (CV(when(coalesce(hit, lit(false)), array(row)), TArr), kerr)
      } else if (geoipTables.contains(tname)) {
        val (reader, locale) = geoipTables(tname)
        val ipExpr = conds.collectFirst { case ("ip", e) => e }.getOrElse(
          throw VrlCompileException(s"$fn: geoip/mmdb tables key on 'ip'"))
        val (ipv, _) = expr(env, ipExpr)
        val (looked, st) =
          graft.enrich.MmdbEnrich.lookupCol(ipv.col, reader, locale)
        if (fn == "get_enrichment_table_record") (CV(looked, TObj(st)), None)
        else (CV(when(looked.isNotNull, array(looked)), TArr), None)
      } else {
      val (names, rows) = enrichmentTables.getOrElse(tname,
        throw VrlCompileException(s"$fn: unknown enrichment table '$tname'"))
      val keyFields = conds.map(_._1)
      def rowKey(r: Seq[Any]): String =
        keyFields.map(k => String.valueOf(r(names.indexOf(k)))).mkString("")
      def rowStruct(r: Seq[Any]): Column =
        struct(names.zip(r).map { case (n, v) => lit(v).as(n) }: _*)
      val probe = concat_ws("",
        conds.map(c => expr(env, c._2)._1.col.cast("string")): _*)
      val grouped = rows.groupBy(rowKey)
      val entries = grouped.toSeq.sortBy(_._1).flatMap { case (k, rs) =>
        val v = if (fn == "get_enrichment_table_record") rowStruct(rs.head)
                else array(rs.map(rowStruct): _*)
        Seq(lit(k), v)
      }
      val looked = try_element_at(map(entries: _*), probe)
      val st = StructType(names.zip(rows.headOption.getOrElse(Seq.empty))
        .map { case (n, v) => StructField(n, v match {
          case _: Long | _: Int => LongType
          case _: Double => DoubleType
          case _: Boolean => BooleanType
          case _ => StringType
        })})
      if (fn == "get_enrichment_table_record")
        (CV(looked, TObj(st)), None)
      else (CV(looked, TArr), None)
      }

    // internal-metrics VRL functions (lib/vector-vrl/metrics/src/):
    // get_vector_metric(key, tags) → first match / null,
    // find_vector_metrics(key, tags) → array of matches,
    // aggregate_vector_metrics(function, key, tags) → sum/avg/min/max
    // over counter+gauge values. Resolved against a SNAPSHOT of the
    // internal registry at COMPILE (plan-build) time — the Spark
    // analogue of the reference's coarse metrics_storage_refresh_period
    // snapshot (a compiled plan re-reads on restart, not per event), so
    // key/tags/function must be literals. Tag values support '*'
    // wildcards like the reference.
    case CallE(fn @ ("get_vector_metric" | "find_vector_metrics"
        | "aggregate_vector_metrics"), _, args, named, None, _) =>
      def litStr(e: VrlAst.Expr, what: String): String = e match {
        case LitS(s) => s
        case _ => throw VrlCompileException(
          s"$fn: $what must be a string literal (compile-time snapshot)")
      }
      def litTags(e: Option[VrlAst.Expr]): Map[String, String] = e match {
        case None => Map.empty
        case Some(ObjectE(fields)) =>
          fields.map { case (k, v) => k -> litStr(v, s"tag '$k'") }.toMap
        case Some(_) => throw VrlCompileException(
          s"$fn: tags must be an object literal")
      }
      def wildcard(pat: String, v: String): Boolean = {
        val re = pat.split("\\*", -1)
          .map(java.util.regex.Pattern.quote).mkString("^", ".*", "$")
        v.matches(re)
      }
      val (aggFun, key, tagsE) = fn match {
        case "aggregate_vector_metrics" =>
          (Some(litStr(args.head, "function")), litStr(args(1), "key"),
            args.lift(2).orElse(named.collectFirst {
              case ("tags", e) => e }))
        case _ =>
          (None, litStr(args.head, "key"),
            args.lift(1).orElse(named.collectFirst {
              case ("tags", e) => e }))
      }
      val tags = litTags(tagsE)
      val rows = graft.streaming.InternalObs.registry
        .snapshot("vector", Map.empty, new java.sql.Timestamp(0L))
        .filter(_.name == key)
        .filter(r => tags.forall { case (k, pat) =>
          r.tags.get(k).exists(v => wildcard(pat, v)) })
        .sortBy(r => r.tags.toSeq.sorted.mkString(""))
      val metricSt = StructType(Seq(
        StructField("name", StringType),
        StructField("tags", MapType(StringType, StringType)),
        StructField("type", StringType),
        StructField("kind", StringType),
        StructField("value", DoubleType)))
      def metricStruct(r: graft.streaming.InternalObs.MetricRow): Column =
        struct(lit(r.name).as("name"),
          typedLit(r.tags).as("tags"),
          lit(r.value_type).as("type"),
          lit(r.kind).as("kind"),
          lit(r.counter_value.orElse(r.gauge_value).getOrElse(0.0))
            .as("value"))
      val values = rows.flatMap(r => r.counter_value.orElse(r.gauge_value))
      fn match {
        case "get_vector_metric" =>
          (rows.headOption.map(r => CV(metricStruct(r), TObj(metricSt)))
            .getOrElse(CV(lit(null).cast(metricSt), TObj(metricSt))), None)
        case "find_vector_metrics" =>
          val arr =
            if (rows.isEmpty)
              lit(null).cast(ArrayType(metricSt))
            else array(rows.map(metricStruct): _*)
          (CV(arr, TArr), None)
        case _ =>
          val out: Column = aggFun.get match {
            case "sum" => lit(values.sum)
            case "avg" =>
              if (values.isEmpty) lit(null).cast("double")
              else lit(values.sum / values.size)
            case "max" =>
              if (values.isEmpty) lit(null).cast("double")
              else lit(values.max)
            case "min" =>
              if (values.isEmpty) lit(null).cast("double")
              else lit(values.min)
            case other => throw VrlCompileException(
              s"aggregate_vector_metrics: unknown function '$other'")
          }
          (CV(out, TFloat), None)
      }

    case CallE("get_secret", _, List(k), _, None, _) =>
      val (kv, err) = expr(env, k)
      val out = env.fields.get("__secrets") match {
        case Some(s) => try_element_at(s.col, kv.col)
        case None => lit(null).cast("string")
      }
      (CV(out, TStr), err)

    case CallE(name, bang, args, named, Some(cl), _) =>
      // closure-bearing call (closure.cue): compile the body against a
      // child scope whose params bind to the HOF lambda variables, so
      // the whole iteration stays inside Catalyst's higher-order
      // functions (no per-element interpreter)
      val (target, tErr) = expr(env, args.headOption.getOrElse(
        throw VrlCompileException(s"$name: closure call needs a target")))
      def body(bind: (String, CV)*): Column =
        block(env.copy(vars = env.vars ++ bind.toMap), cl.body)._2.col
      val cv = (name, target.t, cl.params) match {
        case ("filter", TMap, List(k, v)) =>
          CV(map_filter(target.col, (kc, vc) =>
            coalesce(body(k -> CV(kc, TStr), v -> CV(vc, TAny)), lit(false))), TMap)
        case ("filter", _, List(v)) =>
          CV(filter(target.col, x =>
            coalesce(body(v -> CV(x, TAny)), lit(false))), TArr)
        case ("filter", _, List(i, v)) =>
          CV(filter(target.col, (x, idx) =>
            coalesce(body(i -> CV(idx.cast("long"), TInt), v -> CV(x, TAny)),
              lit(false))), TArr)
        case ("map_values", TMap, List(v)) =>
          CV(transform_values(target.col,
            (_, vc) => body(v -> CV(vc, TAny))), TMap)
        case ("map_values", _, List(v)) =>
          CV(transform(target.col, x => body(v -> CV(x, TAny))), TArr)
        case ("map_keys", TMap, List(k)) =>
          CV(transform_keys(target.col,
            (kc, _) => body(k -> CV(kc, TStr))), TMap)
        case ("replace_with", _, List(m)) =>
          // replace_with(value, pattern) { |m| … } — the closure maps
          // each match object {string, captures}; reassembly interleaves
          // the split parts with the mapped matches, all inside HOFs
          // (no per-row interpreter). Capture groups are re-derived by
          // re-anchoring the pattern on the matched substring.
          val pat = args.lift(1).flatMap(litOf) match {
            case Some(s: String) => s
            case _ => throw VrlCompileException(
              "replace_with: pattern must be a string literal")
          }
          val groups =
            java.util.regex.Pattern.compile(pat).matcher("").groupCount()
          val parts = split(target.col, pat, -1)
          val matches = regexp_extract_all(target.col, lit(pat), lit(0))
          val mapped = transform(matches, x =>
            body(m -> CV(struct(
              x.as("string"),
              array((1 to groups).map(i =>
                regexp_extract(x, pat, i)): _*).as("captures")),
              TObj(StructType(Nil)))).cast("string"))
          val padded = concat(mapped, array(lit("")))
          CV(array_join(flatten(zip_with(parts, padded,
            (p, t) => array(p, coalesce(t, lit(""))))), ""), TStr)
        case (other, t, ps) => throw VrlCompileException(
          s"unsupported closure call: $other over $t with ${ps.length} params")
      }
      (cv, tErr)

    case CallE(name, bang, args, named, None, span) =>
      val argVs = args.map(a => (a, expr(env, a)))
      val namedVs = named.map { case (n, a) => (n, a, expr(env, a)) }
      val childErr = (argVs.map(_._2._2) ++ namedVs.map(_._3._2))
        .flatten.reduceOption(_ || _)
      val result = VrlFunctions.apply(name,
        argVs.map { case (ast, (cv, _)) => VrlFunctions.Arg(cv, litOf(ast)) },
        namedVs.map { case (n, ast, (cv, _)) =>
          n -> VrlFunctions.Arg(cv, litOf(ast))
        }.toMap)
      val selfErr = if (bang) Some(result.col.isNull) else None
      ((result), (childErr, selfErr) match {
        case (Some(a), Some(b)) => Some(a || b)
        case (a, b) => a.orElse(b)
      })
  }

  private def litOf(e: Expr): Option[Any] = e match {
    case LitS(v) => Some(v)
    case LitR(v) => Some(v)
    case LitI(v) => Some(v)
    case LitF(v) => Some(v)
    case LitB(v) => Some(v)
    case UnE("-", LitI(v)) => Some(-v)
    case UnE("-", LitF(v)) => Some(-v)
    // all-literal arrays / objects (e.g. parse_groks patterns + aliases)
    case ArrayE(items) =>
      val ls = items.map(litOf)
      if (ls.forall(_.isDefined)) Some(ls.flatten) else None
    case ObjectE(fields) =>
      val ls = fields.map { case (k, v) => litOf(v).map(k -> _) }
      if (ls.forall(_.isDefined)) Some(ls.flatten.toMap) else None
    case _ => None
  }

  /** Walk residual path segments over a value of (possibly) known type. */
  /** Shallow merge for `|=` on a non-root target: static struct+struct
    * when both schemas are known, map_concat for maps, JSON-bridge
    * otherwise (same stance as the `merge` stdlib function).
    */
  private def mergeCV(env: Env, l0: CV, r0: CV): CV = {
    def byCatalyst(v: CV): CV = resolvedType(env, v.col) match {
      case Some(st: StructType) if st.fields.nonEmpty => CV(v.col, TObj(st))
      case Some(_: MapType) => CV(v.col, TMap)
      case Some(VariantType) => CV(v.col, TVariant)
      case _ => v
    }
    def resolve(v: CV): CV = v.t match {
      case TAny => byCatalyst(v)
      // object literals in expression position carry a schemaless TObj
      case TObj(st) if st.fields.isEmpty => byCatalyst(v)
      case _ => v
    }
    val (l, r) = (resolve(l0), resolve(r0))
    (l.t, r.t) match {
      case (TObj(ls), TObj(rs)) =>
        val keep = ls.fields.filterNot(f => rs.fieldNames.contains(f.name))
        val cols = keep.map(f => l.col.getField(f.name).as(f.name)) ++
          rs.fields.map(f => r.col.getField(f.name).as(f.name))
        CV(struct(cols.toSeq: _*),
          TObj(StructType(keep.toSeq ++ rs.fields.toSeq)))
      case (TMap, TMap) => CV(map_concat(l.col, r.col), TMap)
      case _ => CV(Vrl.mergeVariant(l.col, r.col, deep = false), TVariant)
    }
  }

  private def walk(cv: CV, segs: List[Seg]): CV = segs.foldLeft(cv) {
    case (CV(c, TObj(st)), FieldSeg(n)) =>
      val t = st.fields.find(_.name == n).map(f => vtOf(f.dataType)).getOrElse(TAny)
      CV(c.getField(n), t)
    case (CV(c, TMap), FieldSeg(n)) => CV(element_at(c, n), TAny)
    case (CV(c, TVariant), FieldSeg(n)) =>
      // bracket form for names that aren't plain identifiers (flattened
      // keys like `"field1.field2"`)
      val p = if (n.matches("[A-Za-z_][A-Za-z0-9_]*")) s"$$.$n"
              else s"$$['${n.replace("'", "\\'")}']"
      CV(try_variant_get(c, p, "variant"), TVariant)
    case (CV(c, TVariant), IndexSeg(i)) =>
      CV(try_variant_get(c, s"$$[$i]", "variant"), TVariant)
    case (CV(c, TVarArr), IndexSeg(i)) =>
      CV(try_element_at(c, lit(i + 1)), TVariant)
    // try_element_at, not getItem: ANSI mode throws INVALID_ARRAY_INDEX
    // on out-of-bounds, but VRL path misses yield null (element_at is
    // 1-based; VRL indexes are 0-based)
    case (CV(c, TArr), IndexSeg(i)) => CV(try_element_at(c, lit(i + 1)), TAny)
    case (CV(c, _), IndexSeg(i)) => CV(try_element_at(c, lit(i + 1)), TAny)
    case (CV(c, _), FieldSeg(n)) => CV(c.getField(n), TAny)
  }

  private def isStrTy(t: VT): Boolean = t == TStr || t == TRegex
  private def numRank(t: VT): Int = t match {
    case TFloat => 2; case TInt => 1; case _ => 0
  }

  private def isComposite(t: VT): Boolean = t match {
    case TObj(_) | TMap | TArr | TVarArr | TVariant => true
    case _ => false
  }
  private def dtOf(t: VT): Option[DataType] = t match {
    case TStr | TRegex => Some(StringType)
    case TInt => Some(LongType)
    case TFloat => Some(DoubleType)
    case TBool => Some(BooleanType)
    case TTs => Some(TimestampType)
    case _ => None
  }

  /** VRL `==` across our representations: scalar-vs-variant compares
    * through the variant cast rules; composite comparisons (mixed
    * struct/map/variant shapes, e.g. `.parts == {…literal…}`) compare
    * canonical JSON so shape mismatches are `false`, not analysis errors.
    */
  private def eqCol(l: CV, r: CV): Column = (l.t, r.t) match {
    case (TVariant, rt) if dtOf(rt).isDefined =>
      l.col.try_cast(dtOf(rt).get) <=> r.col
    case (lt, TVariant) if dtOf(lt).isDefined =>
      l.col <=> r.col.try_cast(dtOf(lt).get)
    // variant vs untyped (null literal, walked unknowns): canonical-JSON
    // compare with JSON null folded onto SQL null, so `.nope == null`
    // holds for both representations
    case (TVariant, TAny) =>
      nullif(to_json(l.col), lit("null")) <=>
        nullif(to_json(r.col.cast(VariantType)), lit("null"))
    case (TAny, TVariant) =>
      nullif(to_json(l.col.cast(VariantType)), lit("null")) <=>
        nullif(to_json(r.col), lit("null"))
    case (lt, rt) if isComposite(lt) && isComposite(rt) =>
      (lt, rt) match {
        case (TArr, TArr) => l.col <=> r.col
        case (TObj(a), TObj(b)) if a == b && a.fields.nonEmpty =>
          l.col <=> r.col
        case _ => to_json(l.col) <=> to_json(r.col)
      }
    case _ => l.col <=> r.col
  }

  private def binop(op: String, l: CV, r: CV): CV = op match {
    case "+" =>
      if (isStrTy(l.t) || isStrTy(r.t))
        CV(concat(l.col.cast("string"), r.col.cast("string")), TStr)
      else
        // try_add: ANSI overflow becomes null (VRL: runtime error)
        CV(try_add(l.col, r.col),
          if (numRank(l.t).max(numRank(r.t)) == 2) TFloat else TInt)
    case "-" => CV(try_subtract(l.col, r.col),
      if (numRank(l.t).max(numRank(r.t)) == 2) TFloat else TInt)
    case "*" => CV(try_multiply(l.col, r.col),
      if (numRank(l.t).max(numRank(r.t)) == 2) TFloat else TInt)
    case "/" =>
      // VRL division is float and errors on zero → try_divide's null
      CV(try_divide(l.col.cast("double"), r.col.cast("double")), TFloat)
    case "%" => CV(try_mod(l.col, r.col), l.t)
    case "==" => CV(eqCol(l, r), TBool) // VRL: null == null is true
    case "!=" => CV(!eqCol(l, r), TBool)
    case "<" => CV(l.col < r.col, TBool)
    case "<=" => CV(l.col <= r.col, TBool)
    case ">" => CV(l.col > r.col, TBool)
    case ">=" => CV(l.col >= r.col, TBool)
    case "&&" => CV(l.col && r.col, TBool)
    case "||" =>
      // VRL's `||` is VALUE-producing (logical.cue): a falsy lhs
      // (false or null) yields the rhs VALUE — `false || "foo"` is
      // "foo". Keep the pure-boolean form as a native OR (codegen).
      if (l.t == TBool && r.t == TBool) CV(l.col || r.col, TBool)
      else {
        // VRL falsy = false or null REGARDLESS of static type: a
        // variant/any lhs actually holding boolean false must fall
        // through to the rhs (guard on the variant's runtime schema so
        // e.g. int 0 — truthy in VRL — is NOT caught by a bool cast)
        def variantFalse(c: Column): Column =
          is_variant_null(c) ||
            (schema_of_variant(c) === lit("BOOLEAN") &&
              try_variant_get(c, "$", "boolean") === lit(false))
        val falsy = l.t match {
          case TBool => l.col.isNull || (l.col === lit(false))
          case TVariant => l.col.isNull || variantFalse(l.col)
          case TAny =>
            l.col.isNull || variantFalse(l.col.cast(VariantType))
          case _ => l.col.isNull
        }
        if (l.t == r.t) CV(when(falsy, r.col).otherwise(l.col), l.t)
        else CV(when(falsy, r.col.cast(VariantType))
          .otherwise(l.col.cast(VariantType)), TVariant)
      }
    case "??" =>
      // type unification: a variant arm coerces the other side to
      // variant so coalesce analyzes (`parse_json(..) ?? "nope"`);
      // likewise two arms with DIFFERENT struct schemas, or a struct
      // arm against a scalar (coalesce.cue: `parse_syslog(..) ??
      // parse_common_log(..) ?? "malformed"`)
      def variantize(cv: CV): Column = cv.t match {
        case TVariant => cv.col
        case TObj(_) => to_variant_object(cv.col)
        case _ => cv.col.cast(VariantType)
      }
      (l.t, r.t) match {
        case (TVariant, rt) if rt != TVariant =>
          CV(coalesce(l.col, variantize(r)), TVariant)
        case (lt, TVariant) if lt != TVariant =>
          CV(coalesce(variantize(l), r.col), TVariant)
        case (TObj(a), TObj(b)) if a != b =>
          CV(coalesce(variantize(l), variantize(r)), TVariant)
        case (TObj(_), rt) if !rt.isInstanceOf[TObj] =>
          CV(coalesce(variantize(l), variantize(r)), TVariant)
        case (lt, TObj(_)) if !lt.isInstanceOf[TObj] =>
          CV(coalesce(variantize(l), variantize(r)), TVariant)
        case _ =>
          CV(coalesce(l.col, r.col), if (l.t == r.t) l.t else TAny)
      }
    case other => throw VrlCompileException(s"unknown operator $other")
  }
}
