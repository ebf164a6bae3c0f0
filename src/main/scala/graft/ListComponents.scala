package graft

/** `vector list` equivalent: print every component type the YAML loader
  * accepts, grouped as sources / transforms / sinks / enrichment tables.
  *
  * Reference: /root/reference/src/list.rs (text and json formats). The
  * registry IS ConfigLoader's dispatch: the lists here are the loader's
  * own type registry (declared adjacent to each dispatch), and
  * ToolingSpec drives every listed type through the loader to prove the
  * arm exists — the inventory cannot drift from the dispatch.
  *
  * Usage: graft.ListComponents [--format text|json]
  */
object ListComponents {

  val sources: Seq[String] = graft.plans.ConfigLoader.sourceTypes.sorted

  val transforms: Seq[String] =
    graft.plans.ConfigLoader.transformTypes.sorted

  val sinks: Seq[String] = graft.plans.ConfigLoader.sinkTypes.sorted

  val enrichmentTables: Seq[String] =
    graft.plans.ConfigLoader.enrichmentTableTypes.sorted

  def render(format: String): String = format match {
    case "json" =>
      def arr(xs: Seq[String]) =
        xs.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"sources":${arr(sources)},"transforms":${arr(transforms)},""" +
        s""""sinks":${arr(sinks)},"enrichment_tables":${arr(enrichmentTables)}}"""
    case _ =>
      val sb = new StringBuilder
      sb.append("Sources:\n")
      sources.foreach(s => sb.append(s"- $s\n"))
      sb.append("\nTransforms:\n")
      transforms.foreach(s => sb.append(s"- $s\n"))
      sb.append("\nSinks:\n")
      sinks.foreach(s => sb.append(s"- $s\n"))
      sb.append("\nEnrichment tables:\n")
      enrichmentTables.foreach(s => sb.append(s"- $s\n"))
      sb.toString
  }

  def main(args: Array[String]): Unit = {
    val format = args.sliding(2).collectFirst {
      case Array("--format", f) => f }.getOrElse("text")
    println(render(format))
  }
}
