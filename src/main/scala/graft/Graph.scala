package graft

/** `vector graph` equivalent: render a config's component DAG as
  * Graphviz DOT (default) or Mermaid flowchart text.
  *
  * Reference: /root/reference/src/graph.rs:141-225 (render_dot: sources
  * `trapezium`, transforms `diamond`, sinks `invtrapezium`, enrichment
  * tables `cylinder`; port-qualified inputs become edge labels) and
  * :257-325 (render_mermaid: `id[/id/]`, `id{id}`, `id[\id\]`,
  * `a -->|port| b`).
  *
  * Usage: graft.Graph --config pipeline.yaml [--format dot|mermaid]
  */
object Graph {

  private final case class Parsed(
      sources: Seq[String],
      transforms: Seq[(String, Seq[String])],
      sinks: Seq[(String, Seq[String])],
      tables: Seq[(String, Seq[String])]) {
    val componentIds: Set[String] =
      (sources ++ transforms.map(_._1) ++ sinks.map(_._1) ++
        tables.map(_._1)).toSet
    /** "comp.port" inputs split when the prefix names a component. */
    def edge(input: String): (String, Option[String]) =
      input.split("\\.", 2) match {
        case Array(c, p) if componentIds.contains(c) => (c, Some(p))
        case _ => (input, None)
      }
  }

  private def parse(yaml: String): Parsed = {
    val conf = plans.ConfigLoader.parseYaml(yaml)
    def section(name: String): Seq[(String, Map[String, Any])] =
      conf.get(name).collect {
        case m: java.util.Map[_, _] =>
          import scala.jdk.CollectionConverters._
          m.asScala.toSeq.map { case (k, v) =>
            k.toString -> (v match {
              case vm: java.util.Map[_, _] =>
                vm.asScala.map { case (a, b) => a.toString -> (b: Any) }.toMap
              case _ => Map.empty[String, Any]
            })
          }
      }.getOrElse(Nil)
    def inputsOf(m: Map[String, Any]): Seq[String] = m.getOrElse("inputs", null) match {
      case l: java.util.List[_] =>
        import scala.jdk.CollectionConverters._
        l.asScala.map(_.toString).toSeq
      case null => Nil
      case other => Seq(other.toString)
    }
    Parsed(
      section("sources").map(_._1),
      section("transforms").map { case (id, m) => id -> inputsOf(m) },
      section("sinks").map { case (id, m) => id -> inputsOf(m) },
      section("enrichment_tables").map { case (id, m) => id -> inputsOf(m) })
  }

  def dot(yaml: String): String = {
    val p = parse(yaml)
    val sb = new StringBuilder("digraph {\n")
    def node(id: String, shape: String): Unit =
      sb.append(s"""  "$id" [shape="$shape"]\n""")
    def edges(id: String, inputs: Seq[String]): Unit = inputs.foreach { in =>
      p.edge(in) match {
        case (c, Some(port)) =>
          sb.append(s"""  "$c" -> "$id" [label="$port"]\n""")
        case (c, None) => sb.append(s"""  "$c" -> "$id"\n""")
      }
    }
    p.tables.foreach { case (id, ins) => node(id, "cylinder"); edges(id, ins) }
    p.sources.foreach(node(_, "trapezium"))
    p.transforms.foreach { case (id, ins) => node(id, "diamond"); edges(id, ins) }
    p.sinks.foreach { case (id, ins) => node(id, "invtrapezium"); edges(id, ins) }
    sb.append("}").toString
  }

  def mermaid(yaml: String): String = {
    val p = parse(yaml)
    val sb = new StringBuilder("flowchart TD;\n")
    def edges(id: String, inputs: Seq[String]): Unit = inputs.foreach { in =>
      p.edge(in) match {
        case (c, Some(port)) => sb.append(s"  $c -->|$port| $id\n")
        case (c, None) => sb.append(s"  $c --> $id\n")
      }
    }
    sb.append("\n  %% Enrichment tables\n")
    p.tables.foreach { case (id, ins) =>
      sb.append(s"  $id[($id)]\n"); edges(id, ins)
    }
    sb.append("\n  %% Sources\n")
    p.sources.foreach(id => sb.append(s"  $id[/$id/]\n"))
    sb.append("\n  %% Transforms\n")
    p.transforms.foreach { case (id, ins) =>
      sb.append(s"  $id{$id}\n"); edges(id, ins)
    }
    sb.append("\n  %% Sinks\n")
    p.sinks.foreach { case (id, ins) =>
      sb.append(s"  $id[\\$id\\]\n"); edges(id, ins)
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    def flag(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(k, v) if k == s"--$name" => v }
    val config = flag("config").getOrElse(
      sys.error("usage: graft.Graph --config <yaml> [--format dot|mermaid]"))
    val yaml = plans.ConfigLoader.readConfigFile(config)
    flag("format").getOrElse("dot") match {
      case "dot" => println(dot(yaml))
      case "mermaid" => println(mermaid(yaml))
      case other => sys.error(s"unknown format $other (dot|mermaid)")
    }
  }
}
