package graft

import org.scalatest.funsuite.AnyFunSuite

/** The unified `graft.Main` dispatcher mirrors the reference's
  * subcommand set (src/cli.rs SubCommand) minus the documented platform
  * boundaries (Service; Completion is emitted natively).
  */
class MainSpec extends AnyFunSuite {
  test("every portable reference subcommand dispatches") {
    // kebab-case names from the reference's SubCommand enum, minus the
    // documented boundaries (Service) and Completion (native here)
    val reference = Set("validate", "convert-config", "generate",
      "generate-schema", "list", "test", "graph", "top", "tap", "vrl")
    assert(Main.subcommands.keySet == reference)
  }

  test("completion script covers the dispatch map") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("completion"))
    }
    val script = out.toString("UTF-8")
    Seq("validate", "convert-config", "generate", "generate-schema",
      "list", "test", "graph", "top", "tap", "vrl", "completion")
      .foreach(c => assert(script.contains(c), s"missing $c"))
    assert(script.contains("complete -F _graft graft"))
  }
}
