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
    */
  def tapYaml(configText: String, component: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tap-cfg")
    java.nio.file.Files.write(dir.resolve("00-main.yaml"),
      configText.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("99-tap.yaml"),
      s"""sinks:
         |  __tap:
         |    type: memory
         |    inputs: ["$component"]
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
