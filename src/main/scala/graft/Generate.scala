package graft

/** `vector generate` equivalent: scaffold a runnable YAML config from a
  * `sources/transforms/sinks` expression (reference src/generate.rs —
  * three slash-divided comma lists, optional `<name>:` prefixes,
  * incremental default names; the first transform consumes every
  * source, later transforms chain, sinks consume the last transform or
  * all sources).
  *
  * Usage: graft.Generate [--fragment] 'demo_logs/remap,filter/console'
  */
object Generate {

  private case class Comp(name: String, tpe: String)

  private def parseList(s: String, prefix: String): Seq[Comp] =
    if (s.isEmpty) Nil
    else s.split(",").toSeq.filter(_.nonEmpty).zipWithIndex.map {
      case (part, i) => part.split(":", 2) match {
        case Array(n, t) => Comp(n, t)
        case Array(t) => Comp(s"$prefix${i + 1}", t)
      }
    }

  /** Stub config body for a component type — enough to run under
    * graft.Run (sensible defaults per type; unknown types get a bare
    * `type:` line for the user to fill in).
    */
  private def sourceBody(t: String): Seq[String] = t match {
    case "demo_logs" => Seq("format: json", "interval: 1.0")
    case "file" => Seq("path: /var/log")
    case "socket" => Seq("address: 0.0.0.0:9000")
    case "kafka" => Seq("bootstrap_servers: localhost:9092",
      "topics: [topic1]")
    case "opentelemetry" => Seq("http:", "  address: 0.0.0.0:4318")
    case "internal_metrics" | "host_metrics" => Seq("scrape_interval_secs: 15")
    case _ => Nil
  }
  private def transformBody(t: String): Seq[String] = t match {
    case "remap" => Seq("source: |", "  .processed = true")
    case "filter" => Seq("condition: |", "  true")
    case "sample" => Seq("rate: 10")
    case "throttle" => Seq("threshold: 1000", "window_secs: 1")
    case "dedupe" => Seq("fields:", "  match: [message]")
    case "reduce" => Seq("group_by: [host]")
    case "route" => Seq("route:", "  all: \"true\"")
    case _ => Nil
  }
  private def sinkBody(t: String): Seq[String] = t match {
    case "parquet" | "file" => Seq("path: ./out")
    case "kafka" => Seq("bootstrap_servers: localhost:9092", "topic: out")
    case "prometheus_exporter" => Seq("address: 0.0.0.0:9598")
    case _ => Nil
  }

  def generate(expression: String, fragment: Boolean = false): String = {
    val parts = expression.split("/", -1).padTo(3, "")
    val sources = parseList(parts(0), "source")
    val transforms = parseList(parts(1), "transform")
    val sinks = parseList(parts(2), "sink")

    val sb = new StringBuilder
    if (!fragment) {
      sb ++= "data_dir: /var/lib/graft\n\n"
    }
    def emit(section: String, comps: Seq[Comp],
             inputsOf: Int => Seq[String],
             body: String => Seq[String]): Unit = {
      if (comps.nonEmpty) {
        sb ++= s"$section:\n"
        comps.zipWithIndex.foreach { case (c, i) =>
          sb ++= s"  ${c.name}:\n"
          sb ++= s"    type: ${c.tpe}\n"
          val ins = inputsOf(i)
          if (ins.nonEmpty)
            sb ++= s"    inputs: [${ins.mkString(", ")}]\n"
          body(c.tpe).foreach(l => sb ++= s"    $l\n")
        }
        sb ++= "\n"
      }
    }
    emit("sources", sources, _ => Nil, sourceBody)
    // first transform <- all sources; transform N <- transform N-1
    emit("transforms", transforms,
      i => if (i == 0) sources.map(_.name)
           else Seq(transforms(i - 1).name),
      transformBody)
    // sinks <- last transform, or all sources when no transforms
    emit("sinks", sinks,
      _ => if (transforms.nonEmpty) Seq(transforms.last.name)
           else sources.map(_.name),
      sinkBody)
    sb.toString.stripSuffix("\n")
  }

  def main(args: Array[String]): Unit = {
    val fragment = args.contains("--fragment")
    val expr = args.filterNot(_.startsWith("--")).headOption.getOrElse(
      sys.error("usage: graft.Generate [--fragment] " +
        "'source1,source2/transform1/sink1' (see `vector generate`)"))
    println(generate(expr, fragment))
  }
}
