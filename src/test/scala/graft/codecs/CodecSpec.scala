package graft.codecs

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CodecSpec extends SparkSpec {
  import spark.implicits._

  test("octetCounting framing splits RFC6587 chunks") {
    val chunk = "5 hello3 bye"
    val out = Seq(chunk).toDF("c")
      .select(Framing.octetCounting($"c").as("f"))
      .as[Seq[String]].head()
    assert(out == Seq("hello", "bye"))
  }

  test("octetCounting stops on malformed prefix") {
    val out = Seq("5 helloXYZ").toDF("c")
      .select(Framing.octetCounting($"c").as("f"))
      .as[Seq[String]].head()
    assert(out == Seq("hello"))
  }

  test("lengthDelimited framing reads 4-byte BE prefixes") {
    val payload = {
      val a = "ab".getBytes("UTF-8"); val b = "cde".getBytes("UTF-8")
      val bb = java.nio.ByteBuffer.allocate(4 + a.length + 4 + b.length)
      bb.putInt(a.length).put(a).putInt(b.length).put(b)
      bb.array()
    }
    val out = Seq(payload).toDF("c")
      .select(Framing.lengthDelimited($"c").as("f"))
      .as[Seq[Array[Byte]]].head()
    assert(out.map(new String(_, "UTF-8")) == Seq("ab", "cde"))
  }

  test("syslog5424 structured data and nil fields") {
    val line = "<165>1 2023-10-11T22:14:15Z mach app - ID47 " +
      "[exampleSDID@32473 iut=\"3\"] An application event"
    val p = Seq(line).toDF("c")
      .select(Decode.syslog5424($"c").as("p"))
      .select("p.severity", "p.procid", "p.structured_data", "p.message")
      .as[(String, String, String, String)].head()
    assert(p == (("notice", null, "[exampleSDID@32473 iut=\"3\"]",
      "An application event")))
  }

  test("cef encoder escapes pipes in header fields") {
    val out = Seq("a|b").toDF("name")
      .select(Encode.cef("v", "p", "1", lit("sig"), $"name", lit(5),
        Seq("k" -> lit("v"))).as("c"))
      .as[String].head()
    assert(out == "CEF:0|v|p|1|sig|a\\|b|5|k=v")
  }

  test("prometheus decoder handles commas/equals/escaped quotes in labels and Inf") {
    val line = "http_requests_total{path=\"/a,b=c\",msg=\"say \\\"hi\\\" \\\\\"} " +
      "+Inf 1700000000000"
    val p = Seq(line).toDF("c")
      .select(Decode.prometheusLine($"c").as("p"))
      .select($"p.name", $"p.tags".getItem("path"), $"p.tags".getItem("msg"),
        $"p.value")
      .as[(String, String, String, Double)].head()
    assert(p._1 == "http_requests_total")
    assert(p._2 == "/a,b=c")
    assert(p._3 == "say \"hi\" \\")
    assert(p._4.isPosInfinity)
    val neg = Seq("up -Inf").toDF("c")
      .select(Decode.prometheusLine($"c").getField("value"))
      .as[Double].head()
    assert(neg.isNegInfinity)
  }

  test("influx decoder keeps non-whole-µs nanosecond timestamps exact") {
    // 1700000000000000123 ns → 1700000000000000 µs exactly (double math
    // would land ~1µs off)
    val line = "m,host=a v=1 1700000000000000123"
    val ts = Seq(line).toDF("c")
      .select(unix_micros(Decode.influxLine($"c").getField("timestamp")))
      .as[Long].head()
    assert(ts == 1700000000000000L)
  }
}
