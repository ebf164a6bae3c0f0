package graft

import org.scalatest.funsuite.AnyFunSuite

/** `graft.GenerateSchema` — the schema is generated from the loader's
  * registry, and the repo's own example configs validate against it
  * (closed loop through the [[graft.functions.JsonSchema]] validator).
  */
class GenerateSchemaSpec extends AnyFunSuite {

  private def normalize(yamlText: String): Any = {
    val raw = new org.yaml.snakeyaml.Yaml().load[Any](yamlText)
    graft.functions.JsonLite.parse(graft.functions.JsonLite.render(raw))
  }

  private lazy val schema =
    graft.functions.JsonLite.parse(GenerateSchema.render())

  test("schema enums mirror the loader registry") {
    val txt = GenerateSchema.render()
    ListComponents.sources.foreach(s => assert(txt.contains("\"" + s + "\"")))
    ListComponents.sinks.foreach(s => assert(txt.contains("\"" + s + "\"")))
    ListComponents.transforms.foreach(s =>
      assert(txt.contains("\"" + s + "\"")))
  }

  test("every example config validates against the generated schema") {
    val dir = java.nio.file.Paths.get("examples")
    val yamls = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".yaml"))
    assert(yamls.nonEmpty)
    yamls.foreach { p =>
      val cfg = normalize(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
      val errs = graft.functions.JsonSchema.validate(schema, cfg, true)
      assert(errs.isEmpty, s"$p: $errs")
    }
  }

  test("bad configs are rejected: unknown type, missing inputs, stray key") {
    def errsOf(y: String) =
      graft.functions.JsonSchema.validate(schema, normalize(y), true)
    assert(errsOf(
      """sources:
        |  in:
        |    type: no_such_source
        |""".stripMargin).exists(_.contains("not one of")))
    assert(errsOf(
      """sinks:
        |  out:
        |    type: console
        |""".stripMargin).exists(_.contains("\"inputs\" is a required property")))
    assert(errsOf(
      """zorp: 1
        |""".stripMargin).exists(_.contains("'zorp' was unexpected")))
  }

  test("--output-path writes a fresh file") {
    val dir = java.nio.file.Files.createTempDirectory("gs")
    val out = dir.resolve("schema.json")
    GenerateSchema.main(Array("--output-path", out.toString))
    val txt = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
    assert(txt.contains("\"$schema\""))
    assert(graft.functions.JsonSchema
      .validate(graft.functions.JsonLite.parse(txt),
        graft.functions.JsonLite.parse("{}"), true).isEmpty)
  }
}
