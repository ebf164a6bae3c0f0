package graft.operators

import org.apache.spark.sql.DataFrame

import graft.functions.{JsonLite, MicroLua}
import graft.functions.MicroLua.{LuaFunction, Table}

/** The `lua` transform (src/transforms/lua/v1, v2) over the micro-Lua
  * interpreter. The script compiles ONCE at config-load time (like the
  * reference building its Lua VM per transform); the serializable AST
  * ships inside a distributed flatMap, so execution is per-partition on
  * executors with no driver loop.
  *
  *  - v1 (v1/mod.rs): the script body runs with the log event exposed
  *    as the global `event` table; the mutated table is the output.
  *  - v2 (v2/mod.rs): the `process` hook — inline `function (event,
  *    emit) ... end` or the name of a function defined in `source:` —
  *    receives `{log = {...}}` / `{metric = {...}}` shaped events and
  *    an `emit` callback for 0..N outputs (type conversions included:
  *    set event.log/metric to nil and build the other).
  *
  * Dynamic schema: Lua can emit any shape, so the output schema is
  * discovered by a JSON bridge (rows → toJSON → interpret → read.json).
  * The inference pass is the price of an arbitrary-code transform — the
  * reference pays the same dynamism per event inside its VM.
  */
object Lua {

  // `timestamp` is NOT stripped: scripts read/condition on
  // event.log.timestamp (supported by the reference) as the ISO-8601
  // string toJSON renders; render() restores the timestamp type after
  private val MetaKeys = Set("__event_kind", "__seq")
  private val MetricValueKinds =
    Seq("counter", "gauge", "set", "distribution", "histogram", "summary",
      "sketch")

  def apply(df: DataFrame, version: String, source: String,
            processHook: Option[String], initHook: Option[String] = None,
            shutdownHook: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the dynamic output schema needs a batch inference pass
    // (read.json below) — fail AT CONFIG LOAD on a streaming input
    // instead of surfacing Spark's opaque writeStream error at runtime
    if (df.isStreaming) throw new IllegalArgumentException(
      "lua transform: streaming sources are not supported — Lua output " +
        "schema is discovered by a batch inference pass. Feed the lua " +
        "stage from a batch source, or replace it with a remap (VRL) " +
        "transform whose schema is static.")
    // compile now: a syntax error surfaces at config load, not per task
    val chunk = if (source.nonEmpty) MicroLua.parse(source) else Nil
    def compiled(h: Option[String]): Option[Either[LuaFunction, String]] =
      h.map { s =>
        if (s.trim.startsWith("function")) Left(MicroLua.parseFunction(s))
        else Right(s.trim)
      }
    val process = compiled(processHook)
    val init = compiled(initHook)
    val shutdown = compiled(shutdownHook)
    val isV2 = version == "2" || processHook.nonEmpty

    val outJson = df.toJSON.mapPartitions { it =>
      // ONE VM environment per partition: the reference keeps one Lua VM
      // per transform whose globals persist across events (v2/mod.rs) —
      // per-partition persistence is the distributed analogue, so
      // stateful hooks (counters, buffers flushed by shutdown) work
      // within a partition. Cross-partition globals don't exist, same as
      // cross-instance globals don't in a scaled-out reference
      // deployment.
      val env = new MicroLua.Env(None)
      // v2's `source:` defines named hook functions — run it once per
      // partition; a v1 `source:` IS the per-event script and must only
      // run with `event` bound
      if (isV2) MicroLua.exec(chunk, env)
      def resolve(h: Either[LuaFunction, String], what: String): LuaFunction =
        h match {
          case Left(f) => f
          case Right(n) => env.get(n) match {
            case f: LuaFunction => f
            case _ => throw new MicroLua.LuaError(
              s"$what hook '$n' is not a function")
          }
        }
      val out = List.newBuilder[(String, Table)]
      val emit: Function1[Any, Any] = {
        case e: Table @unchecked =>
          e.getOrElse("log", null) match {
            case l: Table @unchecked => out += (("log", deepCopy(l)))
            case _ => e.getOrElse("metric", null) match {
              case m: Table @unchecked => out += (("metric", deepCopy(m)))
              case _ => ()
            }
          }
          null
        case _ => null
      }
      def callHook(fn: LuaFunction, args: List[Any]): Unit = {
        val local = new MicroLua.Env(Some(env))
        fn.params.zipWithIndex.foreach { case (p, k) =>
          local.declare(p, if (k < args.length) args(k) else null)
        }
        MicroLua.exec(fn.body, local)
      }
      def render(kind: String, t: Table,
                 meta: Option[java.util.Map[String, Any]]): String = {
        val jm = fromLua(t).asInstanceOf[java.util.LinkedHashMap[String, Any]]
        if (kind == "metric")
          MetricValueKinds.find(jm.containsKey).foreach(jm.put("type", _))
        jm.put("__event_kind", kind)
        meta.foreach { row =>
          Option(row.get("__seq")).foreach(jm.put("__seq", _))
          Option(row.get("timestamp")).foreach { ts =>
            if (!jm.containsKey("timestamp")) jm.put("timestamp", ts)
          }
        }
        JsonLite.render(jm)
      }

      init.foreach(h => callHook(resolve(h, "init"), List(emit)))
      val initRows = {
        val r = out.result(); out.clear()
        r.map { case (k, t) => render(k, t, None) }
      }

      val perRow = it.flatMap { line =>
        val row = JsonLite.parse(line)
          .asInstanceOf[java.util.Map[String, Any]]
        val kind = Option(row.get("__event_kind")).map(_.toString)
          .getOrElse("log")
        val fields = MicroLua.table()
        row.forEach { (k, v) =>
          if (!MetaKeys(k)) fields(k) = toLua(v)
        }
        val emitted =
          if (!isV2) {
            // v1 runs the script in the SHARED per-partition state with
            // `event` rebound per row — globals persist across events,
            // exactly the one-Lua-state semantics of v1/mod.rs
            env.declare("event", fields)
            MicroLua.exec(chunk, env)
            env.get("event") match {
              case t: Table @unchecked => List((kind, t))
              case _ => Nil // event = nil drops
            }
          } else {
            val event = MicroLua.table()
            if (kind == "metric") {
              fields.remove("type") // synthetic value-kind column
              event("metric") = fields
            } else event("log") = fields
            val fn = resolve(process.getOrElse(throw new MicroLua.LuaError(
              "lua v2: a process hook is required")), "process")
            callHook(fn, List(event, emit))
            val r = out.result(); out.clear(); r
          }
        emitted.map { case (k, t) => render(k, t, Some(row)) }
      }

      // shutdown runs after the partition drains (v2/mod.rs shutdown
      // hook — last chance to emit buffered state)
      val tail = new Iterator[String] {
        private var done = false
        private var pending: List[String] = Nil
        def hasNext: Boolean = pending.nonEmpty || {
          if (!done) {
            done = true
            shutdown.foreach(h =>
              callHook(resolve(h, "shutdown"), List(emit)))
            pending = out.result().map { case (k, t) => render(k, t, None) }
            out.clear()
          }
          pending.nonEmpty
        }
        def next(): String = {
          if (!hasNext) throw new NoSuchElementException
          val h = pending.head; pending = pending.tail; h
        }
      }
      initRows.iterator ++ perRow ++ tail
    }
    val out = spark.read.json(outJson)
    // read.json parses the ISO text back as string; restore the
    // timestamp type the behavior pipeline uses downstream
    if (out.columns.contains("timestamp"))
      out.withColumn("timestamp",
        org.apache.spark.sql.functions.col("timestamp").cast("timestamp"))
    else out
  }

  /** JSON-side values → Lua: objects become tables, arrays become
    * 1-based integer-keyed tables (Lua array convention).
    */
  private def toLua(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      val t = MicroLua.table()
      m.forEach((k, x) => t(String.valueOf(k)) = toLua(x))
      t
    case l: java.util.List[_] =>
      val t = MicroLua.table()
      var i = 1
      l.forEach { x => t(i.toString) = toLua(x); i += 1 }
      t
    case other => other
  }

  /** Lua → JSON-side: dense 1..n integer-keyed tables fold back to
    * arrays, everything else to objects.
    */
  private def fromLua(v: Any): Any = v match {
    case t: Table @unchecked =>
      val keys = t.keys.toSeq
      val dense = keys.nonEmpty && keys.zipWithIndex.forall {
        case (k, i) => k == (i + 1).toString
      }
      if (dense) {
        val l = new java.util.ArrayList[Any](keys.length)
        keys.foreach(k => l.add(fromLua(t(k))))
        l
      } else {
        val m = new java.util.LinkedHashMap[String, Any]()
        t.foreach { case (k, x) => m.put(k, fromLua(x)) }
        m
      }
    case other => other
  }

  private def deepCopy(t: Table): Table = {
    val c = MicroLua.table()
    t.foreach {
      case (k, v: Table @unchecked) => c(k) = deepCopy(v)
      case (k, v) => c(k) = v
    }
    c
  }
}
