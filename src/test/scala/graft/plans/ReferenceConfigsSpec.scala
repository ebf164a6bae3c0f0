package graft.plans

import graft.SparkSpec

/** The reference ships real-world configs (config/vector.yaml +
  * config/examples/) — every portable one must load through OUR
  * loader: `. = parse_syslog!`, `. |= parse_apache_log!`, wrapped-JSON
  * del/merge chains, log_to_metric histogram/summary, env-var
  * interpolation, varint framing. varint_framing_protobuf.yaml names
  * desc files the reference doesn't ship ("path/to/your/protobuf.desc"
  * etc.) — the engine writes descriptor sets well enough to SELF-HOST
  * those fixtures at test time (same technique as DescriptorSetSpec),
  * so the sweep has NO exclusions beyond the namespacing directory
  * fragment (covered by the --config-dir test).
  */
class ReferenceConfigsSpec extends SparkSpec {

  private val root = java.nio.file.Paths.get("/root/reference/config")

  private def loadable(p: java.nio.file.Path): Unit = {
    val yaml = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val plan = ConfigLoader.load(spark, yaml, "/root/testdata/sf0.001")
    assert(plan.outputs.nonEmpty, s"$p produced no components")
  }

  /** Minimal compiled FileDescriptorSet for `package pkg; message Msg
    * { int64 id=1; string name=2; }` — encoded with the repo's own
    * protobuf encoder against descriptor.proto's published numbers.
    */
  private def descFixture(pkg: String, msg: String): Array[Byte] = {
    import graft.codecs.ProtobufCodec._
    import org.apache.spark.sql.Row
    val FieldDesc = ProtoSchema(Seq(
      ProtoField(1, "name", PString), ProtoField(3, "number", PVarint),
      ProtoField(4, "label", PVarint), ProtoField(5, "type", PVarint),
      ProtoField(6, "type_name", PString)))
    val MsgDesc = ProtoSchema(Seq(
      ProtoField(1, "name", PString),
      ProtoField(2, "field", PRepeated(PMessage(FieldDesc)))))
    val FileDesc = ProtoSchema(Seq(
      ProtoField(2, "package", PString),
      ProtoField(4, "message_type", PRepeated(PMessage(MsgDesc)))))
    val FileSet = ProtoSchema(Seq(
      ProtoField(1, "file", PRepeated(PMessage(FileDesc)))))
    def sRow(schema: ProtoSchema, vals: Any*): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        vals.toArray, schema.sparkType)
    encodeTo(FileSet, sRow(FileSet, Seq(
      sRow(FileDesc, pkg, Seq(
        sRow(MsgDesc, msg, Seq(
          sRow(FieldDesc, "id", 1L, 1L, 3L, null),
          sRow(FieldDesc, "name", 2L, 1L, 9L, null))))))))
  }

  /** Run `body` with behaviorRoot pointing at a temp dir holding the
    * desc files varint_framing_protobuf.yaml names.
    */
  private def withDescFixtures[A](body: => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("refcfg")
    java.nio.file.Files.createDirectories(tmp.resolve("path/to/your"))
    java.nio.file.Files.write(tmp.resolve("path/to/your/protobuf.desc"),
      descFixture("your.package", "MessageType"))
    java.nio.file.Files.write(tmp.resolve("input.desc"),
      descFixture("input", "Message"))
    java.nio.file.Files.write(tmp.resolve("output.desc"),
      descFixture("output", "Message"))
    val prev = ConfigLoader.behaviorRoot
    ConfigLoader.behaviorRoot = tmp.toString
    try body finally ConfigLoader.behaviorRoot = prev
  }

  test("config/vector.yaml loads") {
    assume(java.nio.file.Files.exists(root))
    loadable(root.resolve("vector.yaml"))
  }

  test("every portable example config loads (no exclusions)") {
    assume(java.nio.file.Files.exists(root.resolve("examples")))
    val skip = Set(
      "namespacing") // directory fragment (covered by --config-dir)
    val files = java.nio.file.Files.list(root.resolve("examples"))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.toString.endsWith(".yaml") &&
        !skip(p.getFileName.toString))
    assert(files.length >= 9)
    assert(files.exists(_.getFileName.toString ==
      "varint_framing_protobuf.yaml"))
    withDescFixtures { files.foreach(loadable) }
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
