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

  private val MetaKeys = Set("__event_kind", "__seq", "timestamp")
  private val MetricValueKinds =
    Seq("counter", "gauge", "set", "distribution", "histogram", "summary",
      "sketch")

  def apply(df: DataFrame, version: String, source: String,
            processHook: Option[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // compile now: a syntax error surfaces at config load, not per task
    val chunk = if (source.nonEmpty) MicroLua.parse(source) else Nil
    val inlineHook: Option[LuaFunction] = processHook.flatMap { h =>
      if (h.trim.startsWith("function")) Some(MicroLua.parseFunction(h))
      else None
    }
    val hookName: Option[String] = processHook.filter(!_.trim.startsWith("function"))
    val isV2 = version == "2" || processHook.nonEmpty

    val outJson = df.toJSON.mapPartitions { it =>
      it.flatMap { line =>
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
            val env = new MicroLua.Env(None)
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
            val out = List.newBuilder[(String, Table)]
            val emit: Function1[Any, Any] = {
              case e: Table @unchecked =>
                e.getOrElse("log", null) match {
                  case l: Table @unchecked => out += (("log", deepCopy(l)))
                  case _ => e.getOrElse("metric", null) match {
                    case m: Table @unchecked =>
                      out += (("metric", deepCopy(m)))
                    case _ => ()
                  }
                }
                null
              case _ => null
            }
            val env = new MicroLua.Env(None)
            MicroLua.exec(chunk, env)
            val fn = inlineHook.orElse(hookName.map { n =>
              env.get(n) match {
                case f: LuaFunction => f
                case _ => throw new MicroLua.LuaError(
                  s"process hook '$n' is not a function")
              }
            }).getOrElse(throw new MicroLua.LuaError(
              "lua v2: a process hook is required"))
            val local = new MicroLua.Env(None)
            local.declare(fn.params.headOption.getOrElse("event"), event)
            if (fn.params.length > 1) local.declare(fn.params(1), emit)
            MicroLua.exec(fn.body, local)
            out.result()
          }
        emitted.map { case (k, t) =>
          val jm = fromLua(t).asInstanceOf[java.util.LinkedHashMap[String, Any]]
          if (k == "metric")
            MetricValueKinds.find(jm.containsKey).foreach(jm.put("type", _))
          jm.put("__event_kind", k)
          Option(row.get("__seq")).foreach(jm.put("__seq", _))
          Option(row.get("timestamp")).foreach { ts =>
            if (!jm.containsKey("timestamp")) jm.put("timestamp", ts)
          }
          JsonLite.render(jm)
        }
      }
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
