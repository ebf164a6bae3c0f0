package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sink-side gelf/cef codecs (lib/codecs/src/encoding/format/
  * {gelf,cef}.rs shapes) through LineCodec and the YAML file sink.
  */
class SinkCodecSpec extends SparkSpec {
  import spark.implicits._

  test("gelf sink codec renders version/host/short_message + extras") {
    val df = Seq(("h1", "boom", 3L, "web"))
      .toDF("host", "message", "level", "app")
    val line = df.select(LineCodec.encode(df, "gelf").as("l"))
      .head().getString(0)
    val m = graft.functions.JsonLite.parse(line)
      .asInstanceOf[java.util.Map[String, Any]]
    assert(m.get("version") == "1.1")
    assert(m.get("host") == "h1")
    assert(m.get("short_message") == "boom")
    assert(m.get("level") == 3L)
    assert(m.get("_app") == "web") // non-core field rides _-prefixed
  }

  test("cef sink codec renders the CEF:0 header with config + extensions") {
    val df = Seq(("evil", "10.1.2.3", 7L)).toDF("act", "src", "sev")
    val conf = Map[String, Any]("cef" -> java.util.Map.of(
      "device_vendor", "Acme",
      "device_product", "FW",
      "device_version", "2.1",
      "device_event_class_id", "100",
      "name", "act",           // field reference
      "severity", "sev",
      "extensions", java.util.Map.of("src", "src", "msg", "act")))
    val line = df.select(LineCodec.encode(df, "cef", conf).as("l"))
      .head().getString(0)
    assert(line.startsWith("CEF:0|Acme|FW|2.1|100|evil|7|"), line)
    assert(line.contains("src=10.1.2.3") && line.contains("msg=evil"), line)
  }

  test("csv sink codec honors encoding.csv.fields order") {
    val df = Seq(("a1", "b1", "c1")).toDF("a", "b", "c")
    val conf = Map[String, Any]("csv" -> java.util.Map.of(
      "fields", java.util.List.of("c", "a", "missing")))
    val line = df.select(LineCodec.encode(df, "csv", conf).as("l"))
      .head().getString(0)
    assert(line == "c1,a1,") // missing field renders an EMPTY cell
    val dflt = df.select(LineCodec.encode(df, "csv").as("l"))
      .head().getString(0)
    assert(dflt == "a1,b1,c1")
  }

  test("yaml file sink with encoding.codec cef writes CEF lines") {
    val dir = java.nio.file.Files.createTempDirectory("cefsink")
    val out = dir.resolve("out.log")
    val tmp = java.nio.file.Files.createTempDirectory("cefwork").toString
    graft.plans.ConfigLoader.run(spark,
      s"""
        |sources:
        |  in:
        |    type: parquet
        |    table: events
        |sinks:
        |  cef_out:
        |    type: file
        |    inputs: [in]
        |    path: $out
        |    encoding:
        |      codec: cef
        |      cef:
        |        device_vendor: Graft
        |        device_product: events
        |        device_version: "1.0"
        |        device_event_class_id: event_type
        |        name: event_type
        |        severity: "5"
        |        extensions:
        |          msg: event_type
        |""".stripMargin, "/root/testdata/sf0.001", tmp)
    val lines = java.nio.file.Files.readAllLines(out)
    assert(lines.size == 1000)
    assert(lines.asScala.forall(_.startsWith("CEF:0|Graft|events|1.0|")))
    assert(lines.get(0).contains("msg="))
  }

  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(x => b += x)
      b.result()
    }
  }
}
