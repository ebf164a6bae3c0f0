package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VrlSpec extends SparkSpec {
  import spark.implicits._

  private def one(s: String) = Seq(s).toDF("s")

  test("stripAnsiEscapeCodes removes real ANSI sequences") {
    val in = "\u001b[31mred\u001b[0m plain"
    val out = one(in).select(Vrl.stripAnsiEscapeCodes($"s")).as[String].head()
    assert(out == "red plain")
  }

  test("stripAnsiEscapeCodes leaves innocent [31m]-looking text alone") {
    val in = "file[31m].log and [0m marker"
    val out = one(in).select(Vrl.stripAnsiEscapeCodes($"s")).as[String].head()
    assert(out == in)
  }

  test("parseSyslog3164 extracts pri/facility/severity") {
    val in = "<34>Oct 11 22:14:15 myhost su[123]: 'su root' failed"
    val r = one(in).select(Vrl.parseSyslog3164($"s").as("p"))
      .select("p.priority", "p.facility", "p.severity", "p.hostname",
        "p.appname", "p.procid", "p.message")
      .as[(Int, Int, Int, String, String, Long, String)].head()
    assert(r == ((34, 4, 2, "myhost", "su", 123L, "'su root' failed")))
  }

  test("parseKeyValue handles quoted values") {
    val m = one("a=1 b=\"two words\" junk c=3")
      .select(Vrl.parseKeyValue($"s").as("m"))
      .select(element_at($"m", "a"), element_at($"m", "b"), element_at($"m", "c"))
      .as[(String, String, String)].head()
    assert(m == (("1", "two words", "3")))
  }

  test("ip functions roundtrip") {
    val df = one("10.1.2.3")
    assert(df.select(Vrl.ipAton($"s")).as[Long].head() == 167838211L)
    assert(df.select(Vrl.ipNtoa(Vrl.ipAton($"s"))).as[String].head() == "10.1.2.3")
    assert(df.select(Vrl.ipCidrContains("10.1.0.0/16", $"s")).as[Boolean].head())
    assert(!df.select(Vrl.ipCidrContains("10.2.0.0/16", $"s")).as[Boolean].head())
    assert(df.select(Vrl.ipSubnet($"s", 8)).as[String].head() == "10.0.0.0")
  }

  test("parseDurationSecs") {
    val v = one("1h2m3s").select(Vrl.parseDurationSecs($"s")).as[Double].head()
    assert(math.abs(v - 3723.0) < 1e-9)
    val ms = one("150ms").select(Vrl.parseDurationSecs($"s")).as[Double].head()
    assert(math.abs(ms - 0.15) < 1e-9)
  }

  test("gzip roundtrip") {
    val out = one("hello world")
      .select(Vrl.decodeGzip(Vrl.encodeGzip($"s".cast("binary"))).cast("string"))
      .as[String].head()
    assert(out == "hello world")
  }

  test("decodeZlib yields null on malformed input instead of failing the task") {
    val bad = one("not a zlib stream")
      .select(Vrl.decodeZlib($"s".cast("binary")))
      .as[Option[Array[Byte]]].head()
    assert(bad.isEmpty)
    // truncated-but-valid-prefix input must not throw either
    val rt = one("hello zlib world hello zlib world")
      .select(Vrl.decodeZlib(Vrl.encodeZlib($"s".cast("binary"))).cast("string"))
      .as[String].head()
    assert(rt == "hello zlib world hello zlib world")
  }

  test("parseUserAgent classifies real Edge/Opera UA strings") {
    val edge = "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/119.0.2151.97"
    val opera = "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/121.0.0.0 Safari/537.36 OPR/107.0.0.0"
    val chrome = "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/122.0.0.0 Safari/537.36"
    val out = Seq(edge, opera, chrome).toDF("s")
      .select(Vrl.parseUserAgent($"s").as("ua"))
      .select("ua.browser_family", "ua.browser_major", "ua.os_family")
      .as[(String, Int, String)].collect().toSeq
    assert(out == Seq(("Edge", 119, "Windows"), ("Opera", 107, "Linux"),
      ("Chrome", 122, "Windows")))
  }
}
