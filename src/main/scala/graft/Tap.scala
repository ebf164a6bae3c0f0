package graft

import org.apache.spark.sql.SparkSession

/** `vector tap` equivalent: run a config and live-print the events
  * flowing OUT of any component (source, transform, or a named route
  * port) as JSON lines — the reference's tap attaches to a running
  * topology over the API (src/tap/), here the tap is one extra memory
  * sink merged into the config before it starts.
  *
  * Usage: graft.Tap --config pipeline.yaml --component parsed
  *        [--sf-dir DIR] [--interval SECS] [--duration SECS] [--limit N]
  */
object Tap {

  /** Merge one extra `__tap` memory sink on `component` into the config —
    * the same section-merging path as --config-dir, so the user config
    * is untouched and duplicate-id checks still apply.
    *
    * `component` supports the reference's tap glob patterns
    * (src/tap/mod.rs: `vector tap 'parse*'`): '*' matches any run of
    * characters in component ids; all matching sources/transforms fan
    * into the one tap sink (matching the reference merging multiple
    * matched outputs onto one tap stream). A pattern that matches
    * nothing fails loudly, like an unknown id would.
    */
  def tapYaml(configText: String, component: String): String = {
    val inputs: Seq[String] =
      if (!component.contains("*")) Seq(component)
      else {
        val conf = plans.ConfigLoader.parseYaml(configText)
        def ids(section: String): Seq[String] = conf.get(section) match {
          case Some(m: java.util.Map[_, _]) =>
            import scala.jdk.CollectionConverters._
            m.asScala.keys.map(_.toString).toSeq
          case _ => Nil
        }
        val re = component.split("\\*", -1)
          .map(java.util.regex.Pattern.quote).mkString("^", ".*", "$")
        // route-style transforms expose only NAMED ports — a glob match
        // on one taps every port (reference tap patterns match outputs)
        def yamlMapOf(v: Any): Map[String, Any] = v match {
          case m: java.util.Map[_, _] =>
            import scala.jdk.CollectionConverters._
            m.asScala.map { case (k, x) => k.toString -> (x: Any) }.toMap
          case _ => Map.empty
        }
        val transforms = yamlMapOf(conf.getOrElse("transforms", null))
        def outputsOf(id: String): Seq[String] =
          transforms.get(id).map(yamlMapOf) match {
            case Some(t) if t.getOrElse("type", "") == "route" =>
              yamlMapOf(t.getOrElse("route", null)).keys.toSeq.sorted
                .map(p => s"$id.$p") :+ s"$id._unmatched"
            case Some(t) if t.getOrElse("type", "") == "exclusive_route" =>
              (t.getOrElse("routes", null) match {
                case l: java.util.List[_] =>
                  import scala.jdk.CollectionConverters._
                  l.asScala.toSeq.map(r =>
                    yamlMapOf(r).getOrElse("name", "").toString)
                case _ => Nil
              }).sorted.map(p => s"$id.$p") :+ s"$id._unmatched"
            case _ => Seq(id)
          }
        val matched = (ids("sources") ++ ids("transforms"))
          .filter(_.matches(re)).sorted.flatMap(outputsOf)
        require(matched.nonEmpty,
          s"tap: pattern '$component' matches no source or transform")
        matched
      }
    val dir = java.nio.file.Files.createTempDirectory("graft-tap-cfg")
    java.nio.file.Files.write(dir.resolve("00-main.yaml"),
      configText.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("99-tap.yaml"),
      s"""sinks:
         |  __tap:
         |    type: memory
         |    inputs: [${inputs.map("\"" + _ + "\"").mkString(", ")}]
         |""".stripMargin.getBytes("UTF-8"))
    plans.ConfigLoader.mergeConfigDir(dir.toString)
  }

  def main(args: Array[String]): Unit = {
    def flag(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(k, v) if k == s"--$name" => v }
    val config = flag("config").getOrElse(sys.error(
      "usage: graft.Tap --config <yaml> --component <id> [--sf-dir DIR] " +
        "[--interval SECS] [--duration SECS] [--limit N]"))
    val component = flag("component").getOrElse(
      sys.error("--component <id> is required (use graft.Graph to list)"))
    val sfDir = flag("sf-dir").getOrElse("/root/testdata/sf0.001")
    val intervalSecs = flag("interval").map(_.toDouble).getOrElse(1.0)
    val duration = flag("duration").map(_.toDouble)
    val limit = flag("limit").map(_.toInt).getOrElse(10)
    val workDir = java.nio.file.Files.createTempDirectory("graft-tap").toString

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val yaml = tapYaml(plans.ConfigLoader.readConfigFile(config), component)
    val running = plans.ConfigLoader.run(spark, yaml, sfDir, workDir)

    val t0 = System.nanoTime()
    def timeLeft: Boolean =
      duration.forall(d => (System.nanoTime() - t0) / 1e9 < d)
    var shown = 0L
    try {
      if (running.queries.isEmpty) {
        // batch topology: the tap view is already materialized
        spark.table("__tap").toJSON.collect().take(limit).foreach(println)
      } else {
        while (timeLeft) {
          Thread.sleep((intervalSecs * 1000).toLong)
          running.pollTails()
          val all = spark.table("__tap")
          val n = all.count()
          if (n > shown) {
            // print only the newly-arrived tail, capped at --limit
            val fresh = all.toJSON.collect().drop(shown.toInt)
            fresh.take(limit).foreach(println)
            if (fresh.length > limit)
              println(s"[tap] ... ${fresh.length - limit} more events")
            shown = n
          }
        }
      }
    } finally {
      running.stopAll()
      spark.stop()
    }
  }
}
