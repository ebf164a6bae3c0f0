package graft

import org.apache.spark.sql.SparkSession

/** `vector --config c.yaml` equivalent: load a YAML topology, start one
  * streaming query per streaming sink, write batch sinks once, and run
  * until interrupted (or for `--duration` seconds — useful for smoke
  * runs). Reference lifecycle: src/config/loading/mod.rs:144 (load →
  * compile) then one pipeline task per sink; here each sink is one
  * Catalyst plan / StreamingQuery.
  *
  * Usage: graft.Run --config pipeline.yaml [--sf-dir DIR]
  *        [--work-dir DIR] [--duration SECS]
  */
object Run {
  def main(args: Array[String]): Unit = {
    def flag(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(k, v) if k == s"--$name" => v }
    val config = flag("config").orElse(flag("config-dir")).getOrElse(
      sys.error("usage: graft.Run --config <yaml>|--config-dir <dir> " +
        "[--sf-dir DIR] [--work-dir DIR] [--duration SECS]"))
    val sfDir = flag("sf-dir").getOrElse("/root/testdata/sf0.001")
    val workDir = flag("work-dir").getOrElse(
      java.nio.file.Files.createTempDirectory("graft-run").toString)
    val duration = flag("duration").map(_.toLong)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a directory merges per the reference's config-dir rules
    // (namespaced component files, global merging); .toml converts
    var yaml = plans.ConfigLoader.readConfigFile(config)
    // `provider: {type: http}` bootstrap: the real topology comes from
    // an HTTP endpoint, re-polled for changes (src/providers/http.rs).
    // The initial fetch is part of the build — errors abort, exactly
    // like the reference's ProviderConfig::build.
    val provider = plans.HttpProvider.parse(yaml)
    provider.foreach { p =>
      yaml = plans.HttpProvider.fetch(p)
      println(s"[graft] provider http: configuration loaded from ${p.url}")
    }
    // `--require-healthy` (the reference flag) or the
    // `healthchecks: {require_healthy: true}` global: run every sink's
    // healthcheck BEFORE starting the topology; abort on failure.
    // `healthchecks.enabled: false` disables the whole phase.
    val hcConf = plans.ConfigLoader.parseYaml(yaml)
      .getOrElse("healthchecks", null) match {
        case m: java.util.Map[_, _] =>
          import scala.jdk.CollectionConverters._
          m.asScala.map { case (k, v) => k.toString -> v }.toMap
        case _ => Map.empty[String, Any]
      }
    val hcEnabled = hcConf.getOrElse("enabled", "true").toString.toBoolean
    val hcRequired = args.contains("--require-healthy") ||
      hcConf.getOrElse("require_healthy", "false").toString.toBoolean
    if (hcEnabled && hcRequired) {
      val results = plans.ConfigLoader.healthchecks(yaml)
      results.foreach {
        case (id, Right(_)) => println(s"[graft] healthcheck $id: ok")
        case (id, Left(err)) =>
          println(s"[graft] healthcheck $id: FAILED — $err")
      }
      if (results.exists(_._2.isLeft)) {
        System.err.println("[graft] aborting: a required healthcheck failed")
        spark.stop()
        sys.exit(78)
      }
    }
    var running = plans.ConfigLoader.run(spark, yaml, sfDir, workDir)
    val watch = args.contains("--watch")
    if (running.queries.isEmpty && !watch && provider.isEmpty) {
      println(s"[graft] batch topology complete; outputs under $workDir")
    } else {
      println(s"[graft] streaming: ${running.queries.keys.mkString(", ")} " +
        s"(work dir $workDir)")
      duration match {
        case Some(secs) =>
          Thread.sleep(secs * 1000)
          running.processAllAvailable()
          running.stopAll()
        case None if watch || provider.isDefined =>
          // `--watch`: poll the config file for edits. `provider:`:
          // poll the HTTP endpoint every poll_interval_secs — failed
          // ticks are skipped and the last good config keeps running
          // (providers/http.rs poll_http swallows Err). Either way the
          // change feeds the graph-diff reload (the reference's SIGHUP
          // reload — src/config/diff.rs + src/topology/running.rs).
          while (true) {
            Thread.sleep(provider.map(_.pollIntervalSecs * 1000)
              .getOrElse(1000L))
            val next = try provider.map(plans.HttpProvider.fetch)
                .getOrElse(plans.ConfigLoader.readConfigFile(config))
              catch { case _: Exception => yaml } // mid-save/poll error
            if (next != yaml) {
              // A document that fetched fine but fails to parse or
              // build must not kill the running topology: the
              // reference swallows every config-build error inside the
              // poll tick (providers/http.rs: config::load Err(_) =>
              // {}) and keeps the last good config. reload() rejects
              // un-constructible configs BEFORE stopping anything
              // (dryValidate); if the build still fails mid-swap it
              // restores the old subgraph and reports the handles via
              // ReloadFailedException. Either way `yaml` only advances
              // after a successful reload.
              try {
                val (restart, removed) =
                  plans.ConfigLoader.diffConfigs(yaml, next)
                println(s"[graft] config changed: restarting " +
                  s"${restart.mkString(", ")}" +
                  (if (removed.nonEmpty)
                    s"; removing ${removed.mkString(", ")}" else ""))
                running = plans.ConfigLoader.reload(spark, running, yaml,
                  next, sfDir, workDir)
                yaml = next
              } catch {
                case rf: plans.ConfigLoader.ReloadFailedException =>
                  running = rf.restored
                  System.err.println(s"[graft] ${rf.getMessage}")
                case e: Exception =>
                  System.err.println(
                    s"[graft] reload failed, keeping last good config: " +
                    s"${e.getMessage}")
              }
            }
          }
        case None =>
          spark.streams.awaitAnyTermination()
      }
    }
    spark.stop()
  }
}
