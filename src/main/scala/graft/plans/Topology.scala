package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Topology — the reference's config-level DAG of sources → transforms →
  * sinks, batch-run against DataFrames.
  *
  * Reference: /root/reference/src/config/graph.rs (component graph,
  * `typecheck` per edge :244-267, `check_for_cycles` DFS from sinks
  * :269-302), src/config/compiler.rs:11 (compile), and
  * src/topology/builder.rs:498-630 (fan-in: a component lists many
  * `inputs`, which union; multi-output components expose named ports
  * addressed as `component.port`).
  *
  * Spark-first: a component body is a DataFrame function, so the whole
  * wired topology is ONE Catalyst plan per sink — the optimizer sees
  * through every component boundary (predicate pushdown across the DAG
  * for free, unlike the reference's opaque channel edges). Streaming:
  * the same wiring applies to streaming DataFrames; each sink becomes a
  * writeStream query (see graft.streaming.StreamRunner).
  */
object Topology {

  /** Event-domain type tags for edge typechecking (graph.rs DataType:
    * Log | Metric | Trace; `all` components accept anything).
    */
  sealed trait DataType
  case object Log extends DataType
  case object Metric extends DataType
  case object Trace extends DataType
  case object Any extends DataType

  sealed trait Component { def id: String }
  final case class Source(id: String, outputType: DataType,
                          load: SparkSession => DataFrame) extends Component
  /** Multi-output transform: returns named ports; the default port is
    * "". Downstream addresses ports as "id" (default) or "id.port".
    *
    * `applyMulti`, when set, receives ONE DataFrame PER `inputs` entry
    * (in declaration order) instead of their fan-in union — the hook
    * for relational operators (join) where which-input-is-which
    * matters. Plain transforms leave it None and keep the reference's
    * union fan-in.
    */
  final case class Transform(id: String, inputs: Seq[String],
                             inputType: DataType, outputType: DataType,
                             apply: DataFrame => Map[String, DataFrame],
                             applyMulti: Option[Seq[DataFrame] => Map[String, DataFrame]] = None)
    extends Component
  final case class Sink(id: String, inputs: Seq[String],
                        inputType: DataType) extends Component

  object Transform {
    /** Single-output transform sugar. */
    def simple(id: String, inputs: Seq[String],
               f: DataFrame => DataFrame,
               inputType: DataType = Any,
               outputType: DataType = Any): Transform =
      Transform(id, inputs, inputType, outputType,
        df => Map("" -> f(df)))
  }

  final case class Built(outputs: Map[String, DataFrame]) {
    /** The DataFrame feeding a sink (for batch verification/writing). */
    def sink(id: String): DataFrame = outputs(id)
  }

  /** Compile + run: validates ids, edges, types, acyclicity, then wires
    * every component. Returns the per-sink DataFrames.
    */
  /** Glob pattern → regex (the subset of the reference's `glob` crate
    * that component ids exercise: `*`, `?`, `[...]` / `[!...]`).
    */
  private def globRegex(pat: String): java.util.regex.Pattern = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < pat.length) {
      pat.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val close = pat.indexOf(']', i + 2) // allow ] as first member
          if (close < 0) { sb.append("\\["); }
          else {
            val body0 = pat.substring(i + 1, close)
            val body = if (body0.startsWith("!")) "^" + body0.substring(1)
                       else body0
            sb.append('[').append(body.replace("\\", "\\\\")).append(']')
            i = close
          }
        case c if "\\.^$+{}()|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    java.util.regex.Pattern.compile(sb.append('$').toString)
  }

  /** Compile-time wildcard expansion of `inputs:` references
    * (compiler.rs:27 `expand_globs` / :245 `expand_globs_inner`): each
    * input is tried as a glob against every producer id (self excluded);
    * matches replace the entry in candidate order. A ref that matches
    * nothing stays as-is, so the unknown-input error downstream names
    * the raw reference — the reference's exact fallback semantics.
    */
  def expandGlobInputs(components: Seq[Component],
                       relaxedWildcards: Boolean = false): Seq[Component] = {
    // candidate producers in config order: sources, then transforms
    // (compiler.rs builds the IndexSet in that order)
    val candidates =
      components.collect { case s: Source => s.id } ++
      components.collect { case t: Transform => t.id }
    def expand(selfId: String, inputs: Seq[String]): Seq[String] = {
      val out = inputs.flatMap { raw =>
        if (!raw.exists(c => c == '*' || c == '?' || c == '[')) Seq(raw)
        else {
          val rx = globRegex(raw)
          val hits = candidates.filter(c =>
            c != selfId && rx.matcher(c).matches())
          // `wildcard_matching: relaxed` (global_options.rs:48,
          // graph.rs add_input): an unmatched GLOB is silently ignored
          // instead of becoming an unknown-input error
          if (hits.nonEmpty) hits
          else if (relaxedWildcards) Nil
          else Seq(raw)
        }
      }
      out.distinct // overlapping patterns must not double a fan-in edge
    }
    components.map {
      case t: Transform => t.copy(inputs = expand(t.id, t.inputs))
      case s: Sink      => s.copy(inputs = expand(s.id, s.inputs))
      case other        => other
    }
  }

  def build(spark: SparkSession, components0: Seq[Component],
            relaxedWildcards: Boolean = false): Built = {
    val components = expandGlobInputs(components0, relaxedWildcards)
    val byId = components.map(c => c.id -> c).toMap
    require(byId.size == components.size, "duplicate component ids")

    def producerOf(ref: String): (Component, String) = {
      // an exact component id wins over a port split — multi-output
      // SOURCES register dotted siblings (otel.logs/.metrics/.traces)
      // as real components, unlike transform ports
      val (id, port) =
        if (byId.contains(ref)) (ref, "")
        else ref.split("\\.", 2) match {
          case Array(i, p) if byId.contains(i) => (i, p)
          case _ => (ref, "")
        }
      (byId.getOrElse(id,
        throw new IllegalArgumentException(s"unknown input '$ref'")), port)
    }

    // ---- typecheck (graph.rs:244-267) ----------------------------------
    def outType(c: Component): DataType = c match {
      case s: Source    => s.outputType
      case t: Transform => t.outputType
      case _            => Any
    }
    components.foreach {
      case t: Transform => t.inputs.foreach { ref =>
        val ot = outType(producerOf(ref)._1)
        require(t.inputType == Any || ot == Any || ot == t.inputType,
          s"type mismatch on edge $ref -> ${t.id}: $ot vs ${t.inputType}")
      }
      case s: Sink => s.inputs.foreach { ref =>
        val ot = outType(producerOf(ref)._1)
        require(s.inputType == Any || ot == Any || ot == s.inputType,
          s"type mismatch on edge $ref -> ${s.id}: $ot vs ${s.inputType}")
      }
      case _ => ()
    }

    // ---- cycle check: DFS from sinks (graph.rs:269-302) ----------------
    def inputsOf(c: Component): Seq[String] = c match {
      case t: Transform => t.inputs.map(r => producerOf(r)._1.id)
      case s: Sink      => s.inputs.map(r => producerOf(r)._1.id)
      case _            => Nil
    }
    val visiting = scala.collection.mutable.Set[String]()
    val done = scala.collection.mutable.Set[String]()
    def dfs(id: String): Unit = {
      require(!visiting.contains(id), s"cycle through component '$id'")
      if (!done.contains(id)) {
        visiting += id
        inputsOf(byId(id)).foreach(dfs)
        visiting -= id
        done += id
      }
    }
    components.collect { case s: Sink => s }.foreach(s => dfs(s.id))

    // ---- wire ----------------------------------------------------------
    val outputs = scala.collection.mutable.Map[String, DataFrame]()
    def outputOf(ref: String): DataFrame = {
      val (comp, port) = producerOf(ref)
      val key = if (port.isEmpty) comp.id else s"${comp.id}.$port"
      outputs.getOrElseUpdate(key, {
        compute(comp)
        outputs.getOrElse(key,
          throw new IllegalArgumentException(
            s"component '${comp.id}' has no output port '$port'"))
      })
    }
    // fan-in: many inputs union by name (builder.rs:498-630)
    def fanIn(id: String, refs: Seq[String]): DataFrame = {
      if (refs.isEmpty) throw new IllegalArgumentException(
        s"component '$id' has no inputs — every transform and sink " +
          "must name at least one upstream component")
      refs.map(outputOf).reduce(_.unionByName(_, allowMissingColumns = true))
    }
    def compute(c: Component): Unit = c match {
      case s: Source =>
        outputs.getOrElseUpdate(s.id, s.load(spark))
      case t: Transform =>
        if (!outputs.contains(t.id) &&
            !outputs.keys.exists(_.startsWith(t.id + "."))) {
          val res = t.applyMulti match {
            case Some(f) =>
              if (t.inputs.isEmpty) throw new IllegalArgumentException(
                s"component '${t.id}' has no inputs — every transform " +
                  "and sink must name at least one upstream component")
              f(t.inputs.map(outputOf))
            case None => t.apply(fanIn(t.id, t.inputs))
          }
          res.foreach { case (port, df) =>
            outputs(if (port.isEmpty) t.id else s"${t.id}.$port") = df
          }
        }
      case _ => ()
    }

    val sinkFrames = components.collect {
      case s: Sink => s.id -> fanIn(s.id, s.inputs)
    }.toMap
    Built(sinkFrames)
  }
}
