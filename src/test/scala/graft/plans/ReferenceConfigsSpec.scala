package graft.plans

import graft.SparkSpec

/** The reference ships real-world configs (config/vector.yaml +
  * config/examples/) — every portable one must load through OUR
  * loader: `. = parse_syslog!`, `. |= parse_apache_log!`, wrapped-JSON
  * del/merge chains, log_to_metric histogram/summary, env-var
  * interpolation, varint framing. The one exclusion is
  * varint_framing_protobuf.yaml, whose desc_file
  * ("path/to/your/protobuf.desc") doesn't exist on disk — the decoder
  * itself is supported (DescriptorSetSpec drives desc_file +
  * message_type end-to-end with a self-hosted descriptor fixture).
  */
class ReferenceConfigsSpec extends SparkSpec {

  private val root = java.nio.file.Paths.get("/root/reference/config")

  private def loadable(p: java.nio.file.Path): Unit = {
    val yaml = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val plan = ConfigLoader.load(spark, yaml, "/root/testdata/sf0.001")
    assert(plan.outputs.nonEmpty, s"$p produced no components")
  }

  test("config/vector.yaml loads") {
    assume(java.nio.file.Files.exists(root))
    loadable(root.resolve("vector.yaml"))
  }

  test("every portable example config loads") {
    assume(java.nio.file.Files.exists(root.resolve("examples")))
    val skip = Set(
      "varint_framing_protobuf.yaml", // needs protobuf desc_file
      "namespacing")                  // directory fragment (covered by --config-dir)
    val files = java.nio.file.Files.list(root.resolve("examples"))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.toString.endsWith(".yaml") &&
        !skip(p.getFileName.toString))
    assert(files.length >= 8)
    files.foreach(loadable)
  }

  test("the namespaced config directory merges and loads") {
    val ns = root.resolve("examples").resolve("namespacing")
    assume(java.nio.file.Files.exists(ns))
    val yaml = ConfigLoader.readConfigFile(ns.toString)
    val plan = ConfigLoader.load(spark, yaml, "/root/testdata/sf0.001")
    assert(plan.outputs.keySet == Set("es_cluster", "s3_archives"))
  }

  test("log_to_metric histogram/summary emit distribution samples") {
    val tmp = java.nio.file.Files.createTempDirectory("l2mh").toString
    ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: parquet
        |    table: events
        |transforms:
        |  m:
        |    type: log_to_metric
        |    inputs: [in]
        |    metrics:
        |      - type: histogram
        |        field: value
        |        name: value_hist
        |      - type: summary
        |        field: value
        |        name: value_sum
        |      - type: histogram
        |        field: no_such_field
        |        name: ghost
        |sinks:
        |  out:
        |    type: memory
        |    inputs: [m]
        |""".stripMargin, "/root/testdata/sf0.001", tmp)
    val got = spark.table("out")
    import org.apache.spark.sql.functions._
    val byName = got.groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.contains("value_hist") && byName.contains("value_sum"))
    assert(!byName.contains("ghost")) // missing field -> no metric
    val one = got.filter(col("name") === "value_hist").head()
    assert(one.getAs[String]("value_type") == "distribution")
    val samples = one.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
      "dist_samples")
    assert(samples.length == 1 && samples.head.getLong(1) == 1L)
  }
}
