package graft

/** `vector generate-schema` equivalent: emit a JSON schema describing
  * the configuration surface the YAML loader accepts.
  *
  * Reference: /root/reference/src/generate_schema.rs (renders the root
  * schema of ConfigBuilder; refuses to overwrite an existing
  * --output-path). The reference derives its schema from the
  * `Configurable` machinery; here the schema is generated from the
  * loader's own type registry (ConfigLoader.sourceTypes & co. — the
  * same lists `vector list` prints and ToolingSpec drives through the
  * loader), so the component-type enums cannot drift from the dispatch.
  *
  * Usage: graft.GenerateSchema [--output-path FILE]
  */
object GenerateSchema {

  private def m(kvs: (String, Any)*): java.util.LinkedHashMap[String, Any] = {
    val out = new java.util.LinkedHashMap[String, Any]()
    kvs.foreach { case (k, v) => out.put(k, v) }
    out
  }
  private def l(xs: Seq[Any]): java.util.ArrayList[Any] = {
    val out = new java.util.ArrayList[Any](xs.length)
    xs.foreach(out.add)
    out
  }

  /** A component map section: named components, each an open object
    * whose `type` is pinned to the registry enum. Transforms/sinks also
    * require `inputs` (config/mod.rs: every non-source component names
    * its upstream edges).
    */
  private def section(ref: String) =
    m("type" -> "object",
      "additionalProperties" -> m("$ref" -> s"#/$$defs/$ref"))

  private def component(types: Seq[String], withInputs: Boolean) = {
    val req: Seq[Any] = if (withInputs) Seq("type", "inputs") else Seq("type")
    m("type" -> "object",
      "required" -> l(req),
      "properties" -> m(
        ("type" -> m("enum" -> l(types))) +:
        (if (withInputs)
          Seq("inputs" -> m("type" -> "array",
            "items" -> m("type" -> "string"), "minItems" -> 1L))
        else Nil): _*),
      "additionalProperties" -> true)
  }

  def schema(): java.util.LinkedHashMap[String, Any] =
    m(
      "$schema" -> "https://json-schema.org/draft/2020-12/schema",
      "title" -> "graft configuration",
      "type" -> "object",
      "properties" -> m(
        "sources" -> section("source"),
        "transforms" -> section("transform"),
        "sinks" -> section("sink"),
        "enrichment_tables" -> section("enrichment_table"),
        "tests" -> m("type" -> "array", "items" -> m("type" -> "object")),
        "secret" -> m("type" -> "object"),
        "api" -> m("type" -> "object",
          "properties" -> m(
            "enabled" -> m("type" -> "boolean"),
            "address" -> m("type" -> "string"))),
        "log_schema" -> m("type" -> "object"),
        "schema" -> m("type" -> "object"),
        "timezone" -> m("type" -> "string"),
        "healthchecks" -> m("type" -> "object",
          "properties" -> m(
            "enabled" -> m("type" -> "boolean"),
            "require_healthy" -> m("type" -> "boolean"))),
        "acknowledgements" -> m("type" -> "object"),
        "expire_metrics_secs" -> m("type" -> "number"),
        "provider" -> m("type" -> "object",
          "required" -> l(Seq("type")),
          "properties" -> m(
            "type" -> m("enum" -> l(Seq("http"))),
            "url" -> m("type" -> "string"),
            "request" -> m("type" -> "object"),
            "poll_interval_secs" -> m("type" -> "number"),
            "config_format" -> m("enum" -> l(Seq("toml", "json", "yaml"))),
            "interpolate_env" -> m("type" -> "boolean"))),
        "proxy" -> m("type" -> "object",
          "properties" -> m(
            "enabled" -> m("type" -> "boolean"),
            "http" -> m("type" -> "string"),
            "https" -> m("type" -> "string"),
            "no_proxy" -> m("type" -> "array",
              "items" -> m("type" -> "string"))))),
      "additionalProperties" -> false,
      "$defs" -> m(
        "source" -> component(ListComponents.sources, withInputs = false),
        "transform" -> component(ListComponents.transforms, withInputs = true),
        "sink" -> component(ListComponents.sinks, withInputs = true),
        "enrichment_table" ->
          component(ListComponents.enrichmentTables, withInputs = false)))

  def render(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(schema())
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.sliding(2).collectFirst {
      case Array("--output-path", p) => p }
    val json = render()
    outPath match {
      case Some(p) =>
        val path = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.exists(path)) {
          // reference generate_schema.rs: CANTCREAT on existing target
          System.err.println(s"Error: Output file $p already exists")
          sys.exit(73)
        }
        java.nio.file.Files.write(path, json.getBytes("UTF-8"))
        println(s"Schema successfully written to $p")
      case None => println(json)
    }
  }
}
