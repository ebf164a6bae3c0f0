package graft

import org.apache.spark.sql.SparkSession

/** `vector validate` equivalent: load the config, interpolate secrets,
  * build the component DAG (per-edge typecheck + cycle detection via
  * [[plans.Topology.build]]) and report per-component health — exit 0
  * when everything builds, 78 (EX_CONFIG) otherwise.
  *
  * Reference: /root/reference/src/validate.rs (validate_config →
  * validate_components → per-component `√`/`x` lines and a final
  * `Validated` banner). Environment/health checks (ports, AWS creds)
  * are connector-scope; the Spark analogue is the plan building at all.
  *
  * Usage: graft.Validate --config pipeline.yaml [--sf-dir DIR]
  */
object Validate {

  /** Build everything and collect per-component failures; pure so tests
    * can call it without the CLI shell.
    */
  def check(spark: SparkSession, yaml: String, sfDir: String)
      : Seq[(String, Option[String])] = {
    val conf =
      try plans.ConfigLoader.parseYaml(yaml)
      catch {
        case e: Exception => return Seq("config" -> Some(e.getMessage))
      }
    import scala.jdk.CollectionConverters._
    def ids(section: String): Seq[String] = conf.getOrElse(section, null) match {
      case m: java.util.Map[_, _] => m.asScala.keys.map(_.toString).toSeq
      case _ => Nil
    }
    val components =
      ids("sources") ++ ids("transforms") ++ ids("sinks")
    try {
      val built = plans.ConfigLoader.load(spark, yaml, sfDir)
      // force each sink's plan through the analyzer: a transform whose
      // VRL doesn't compile or whose columns don't resolve fails HERE,
      // not at runtime — the moral equivalent of validate_components
      ids("sinks").foreach(s => built.outputs(s).schema)
      components.map(_ -> None)
    } catch {
      case e: Exception =>
        val msg = Option(e.getMessage).getOrElse(e.toString)
        components.map { c =>
          c -> (if (msg.contains(c)) Some(msg) else None)
        } match {
          // if no component is named in the error, pin it on the config
          case cs if cs.forall(_._2.isEmpty) =>
            cs :+ ("config" -> Some(msg))
          case cs => cs
        }
    }
  }

  def main(args: Array[String]): Unit = {
    def flag(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(k, v) if k == s"--$name" => v }
    val config = flag("config").orElse(flag("config-dir")).getOrElse(
      sys.error("usage: graft.Validate --config <yaml>|--config-dir <dir> [--sf-dir DIR]"))
    val sfDir = flag("sf-dir").getOrElse("/root/testdata/sf0.001")
    val yaml = plans.ConfigLoader.readConfigFile(config)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val results = check(spark, yaml, sfDir)
      results.foreach {
        case (id, None) => println(s"+ component $id")
        case (id, Some(err)) => println(s"x component $id: $err")
      }
      if (results.forall(_._2.isEmpty)) {
        println(s"Validated $config")
      } else {
        sys.exit(78) // EX_CONFIG, the reference's exitcode::CONFIG
      }
    } finally spark.stop()
  }
}
