package graft.plans

import graft.SparkSpec

/** Directory / multi-file config loading against the reference's OWN
  * fixture trees (tests/config-dir, tests/namespacing — cloned under
  * resources/config-tree with a provenance header), mirroring the five
  * asserts in src/config/loading/config_builder.rs:142-225.
  */
class ConfigDirSpec extends SparkSpec {

  private def tree(name: String): String =
    getClass.getResource(s"/config-tree/$name").getPath

  test("reference namespacing/success: components load from per-type subdirectories") {
    val yaml = ConfigLoader.mergeConfigDir(tree("namespacing/success"))
    val conf = ConfigLoader.parseYaml(yaml)
    def section(s: String) = conf(s).asInstanceOf[java.util.Map[String, Any]]
    // file stem = component id; es_cluster.json proves JSON files join in
    assert(section("transforms").containsKey("apache_parser"))
    assert(section("transforms").containsKey("apache_sample"))
    assert(section("sources").containsKey("apache_logs"))
    assert(section("sources").containsKey("generator"))
    assert(section("sinks").containsKey("es_cluster"))
    assert(section("sinks").containsKey("s3_archives"))
    // one test from vector.yaml, one from tests/foo.yaml
    assert(conf("tests").asInstanceOf[java.util.List[Any]].size == 2)
    assert(conf("data_dir") == "/var/lib/vector")
  }

  test("reference namespacing/ignore-invalid: unknown subdirectories are skipped") {
    // foo/bar.yaml lives in an unknown namespace and must not break the load
    val yaml = ConfigLoader.mergeConfigDir(tree("namespacing/ignore-invalid"))
    val conf = ConfigLoader.parseYaml(yaml)
    assert(conf("sources").asInstanceOf[java.util.Map[String, Any]]
      .containsKey("apache_logs"))
    assert(!yaml.contains("bar"))
  }

  test("reference config-dir/ignore-unknown: non-config file extensions are skipped") {
    val yaml = ConfigLoader.mergeConfigDir(tree("config-dir/ignore-unknown"))
    val conf = ConfigLoader.parseYaml(yaml)
    assert(conf("sources").asInstanceOf[java.util.Map[String, Any]]
      .containsKey("source0"))
    assert(!yaml.contains("1234")) // foo.txt's content never parsed
  }

  test("reference config-dir/globals: global options merge beside components") {
    val yaml = ConfigLoader.mergeConfigDir(tree("config-dir/globals"))
    val conf = ConfigLoader.parseYaml(yaml)
    assert(conf("data_dir") == "/var/lib/vector")
    assert(conf("timezone") == "America/Los_Angeles")
    assert(conf("log_schema").asInstanceOf[java.util.Map[String, Any]]
      .get("message_key") == "foo")
    assert(conf("sinks").asInstanceOf[java.util.Map[String, Any]]
      .containsKey("sink0"))
  }

  test("reference config-dir/globals-duplicate: identical re-stated globals load fine") {
    // both globals files state the SAME values — the reference loads
    // this tree successfully; only conflicting values are an error
    val yaml = ConfigLoader.mergeConfigDir(tree("config-dir/globals-duplicate"))
    assert(ConfigLoader.parseYaml(yaml)("data_dir") == "/var/lib/vector")
  }

  test("conflicting global values across files error out") {
    val dir = java.nio.file.Files.createTempDirectory("confconflict")
    java.nio.file.Files.write(dir.resolve("a.yaml"),
      "data_dir: /one\n".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.yaml"),
      "data_dir: /two\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      ConfigLoader.mergeConfigDir(dir.toString)
    }
    assert(e.getMessage.contains("conflicting values for global 'data_dir'"))
  }

  test("a namespaced config-dir runs end-to-end") {
    // our own runnable tree in the reference's layout: a top-level
    // globals file, per-type component files, one memory sink
    val dir = java.nio.file.Files.createTempDirectory("confrun")
    java.nio.file.Files.write(dir.resolve("globals.yaml"),
      "data_dir: /tmp\n".getBytes("UTF-8"))
    for (sub <- Seq("sources", "transforms", "sinks"))
      java.nio.file.Files.createDirectory(dir.resolve(sub))
    java.nio.file.Files.write(dir.resolve("sources").resolve("ev.yaml"),
      "type: parquet\ntable: events\n".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("transforms").resolve("errs.yaml"),
      ("type: filter\ninputs: [ev]\n" +
        "condition: .event_type == \"error\"\n").getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("sinks").resolve("tapdir.yaml"),
      "type: memory\ninputs: [errs]\n".getBytes("UTF-8"))
    val yaml = ConfigLoader.mergeConfigDir(dir.toString)
    val tmp = java.nio.file.Files.createTempDirectory("confrunwork").toString
    val running = ConfigLoader.run(spark, yaml, "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      assert(spark.table("tapdir").count() == 201) // error rows at sf0.001
    } finally running.stopAll()
  }

  test("timezone global applies to the session while a config loads") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      ConfigLoader.load(spark,
        """
          |timezone: America/Los_Angeles
          |sources:
          |  ev:
          |    type: parquet
          |    table: events
          |sinks:
          |  tz_out:
          |    type: memory
          |    inputs: [ev]
          |""".stripMargin, "/root/testdata/sf0.001")
      assert(spark.conf.get("spark.sql.session.timeZone") ==
        "America/Los_Angeles")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("duplicate component ids across files error out") {
    val dir = java.nio.file.Files.createTempDirectory("confdup")
    java.nio.file.Files.write(dir.resolve("a.yaml"),
      "sources:\n  s0:\n    type: parquet\n".getBytes("UTF-8"))
    java.nio.file.Files.createDirectory(dir.resolve("sources"))
    java.nio.file.Files.write(dir.resolve("sources").resolve("s0.yaml"),
      "type: parquet\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      ConfigLoader.mergeConfigDir(dir.toString)
    }
    assert(e.getMessage.contains("duplicate component 's0'"))
  }
}
