package graft

/** Unified CLI entry mirroring the reference's single `vector` binary
  * (src/cli.rs SubCommand): `graft.Main <subcommand> [args...]`, or no
  * subcommand + `--config` to run the topology (the reference's default
  * mode). Each subcommand delegates to the existing dedicated main.
  *
  * `service` (systemd/windows service management) is a platform
  * boundary; `completion` prints a bash completion covering the
  * subcommand set, standing in for the reference's clap-generated
  * shells.
  */
object Main {

  private[graft] val subcommands: Map[String, Array[String] => Unit] = Map(
    "list" -> ListComponents.main,
    "validate" -> Validate.main,
    "graph" -> Graph.main,
    "generate" -> Generate.main,
    "generate-schema" -> GenerateSchema.main,
    "convert-config" -> ConvertConfig.main,
    "test" -> VectorTest.main,
    "top" -> Top.main,
    "tap" -> Tap.main,
    "vrl" -> VrlTool.main)

  private def completionScript: String = {
    val names = (subcommands.keys.toSeq :+ "completion").sorted
      .mkString(" ")
    s"""_graft() {
       |  local cur="$${COMP_WORDS[COMP_CWORD]}"
       |  if [ "$$COMP_CWORD" -eq 1 ]; then
       |    COMPREPLY=( $$(compgen -W "$names" -- "$$cur") )
       |  else
       |    COMPREPLY=( $$(compgen -f -- "$$cur") )
       |  fi
       |}
       |complete -F _graft graft
       |""".stripMargin
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("completion") => println(completionScript)
    case Some("service") =>
      System.err.println(
        "service management is not supported on this runtime")
      sys.exit(64)
    case Some(cmd) if subcommands.contains(cmd) =>
      subcommands(cmd)(args.drop(1))
    case Some(flag) if flag.startsWith("--") => Run.main(args)
    case _ =>
      System.err.println(
        "usage: graft.Main <" +
          (subcommands.keys.toSeq :+ "completion").sorted.mkString("|") +
          "> [args...] | graft.Main --config <yaml>")
      sys.exit(64)
  }
}
