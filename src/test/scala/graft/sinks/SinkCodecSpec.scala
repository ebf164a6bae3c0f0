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

  test("syslog sink codec: rfc5424 + rfc3164, parseable by our own decoder") {
    val df = Seq(("h1", "web", "warning", "local0", "something broke", 42L))
      .toDF("hostname", "app", "level", "fac", "message", "pid")
      .withColumn("timestamp",
        lit("2024-03-05T10:00:00Z").cast("timestamp"))
    val conf = Map[String, Any]("syslog" -> java.util.Map.of(
      "rfc", "rfc5424", "facility", "fac", "severity", "level",
      "app_name", "app", "proc_id", "pid"))
    val line5424 = df.select(LineCodec.encode(df, "syslog", conf).as("l"))
      .head().getString(0)
    // local0=16, warning=4 -> pri 132
    assert(line5424.startsWith("<132>1 2024-03-05T10:00:00.000Z h1 web 42 - - "),
      line5424)
    assert(line5424.endsWith("something broke"))
    // roundtrip through the RFC5424 decoder
    val parsed = df.sparkSession.createDataset(Seq(line5424))(
      org.apache.spark.sql.Encoders.STRING).toDF("line")
      .select(graft.codecs.Decode.syslog5424Tokens(
        org.apache.spark.sql.functions.col("line")).as("t"))
      .select("t.*").head()
    assert(parsed.getAs[String]("hostname") == "h1")
    assert(parsed.getAs[String]("appname") == "web")

    val conf3164 = Map[String, Any]("syslog" -> java.util.Map.of(
      "rfc", "rfc3164", "severity", "level", "app_name", "app",
      "proc_id", "pid"))
    val line3164 = df.select(LineCodec.encode(df, "syslog", conf3164).as("l"))
      .head().getString(0)
    // default facility user=1, warning=4 -> pri 12
    assert(line3164.startsWith("<12>Mar 05 10:00:00 h1 web[42]: "), line3164)
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
