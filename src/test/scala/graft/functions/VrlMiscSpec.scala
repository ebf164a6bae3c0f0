package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5b registry additions: syslog coercions, the IPv6 family,
  * enumerate/match helpers, type predicates, and the id/crypto wiring
  * (reference docs under website/cue/reference/remap/functions/).
  */
class VrlMiscSpec extends SparkSpec {
  import spark.implicits._

  private def one(s: String) = Seq((1L, s)).toDF("id", "s")

  private def run1(input: String, program: String): org.apache.spark.sql.Row =
    VrlCompiler.run(one(input), program).primary.head()

  test("to_syslog_severity accepts the documented aliases") {
    val df = Seq((1L, "panic"), (2L, "error"), (3L, "warn"), (4L, "debug"))
      .toDF("id", "s")
    val out = VrlCompiler.run(df, """.sev = to_syslog_severity(.s)""")
      .primary.orderBy("id").select("sev").as[Long].collect()
    assert(out.toSeq == Seq(0L, 3L, 4L, 7L))
  }

  test("to_syslog_facility covers kern through local7") {
    val df = Seq((1L, 0), (2L, 9), (3L, 23)).toDF("id", "n")
    val out = VrlCompiler.run(df, """.f = to_syslog_facility(.n)""")
      .primary.orderBy("id").select("f").as[String].collect()
    assert(out.toSeq == Seq("kern", "cron", "local7"))
  }

  test("to_syslog_facility_code inverts the keyword table; unknown errors") {
    val df = Seq((1L, "kern"), (2L, "cron"), (3L, "local7"), (4L, "nope"))
      .toDF("id", "s")
    val out = VrlCompiler.run(df,
      """.c = to_syslog_facility_code(.s) ?? -1""")
      .primary.orderBy("id").select("c").as[Long].collect()
    assert(out.toSeq == Seq(0L, 9L, 23L, -1L))
  }

  test("is_regex resolves statically on the compile-time type") {
    val r = run1("x",
      """.yes = is_regex(r'\d+')
        |.no = is_regex(.s)
        |.no2 = is_regex(42)""".stripMargin)
    assert(r.getAs[Boolean]("yes") && !r.getAs[Boolean]("no") &&
      !r.getAs[Boolean]("no2"))
  }

  test("ipv6_to_ipv4 errors (null) on a non-mapped address") {
    val r = run1("2001:db8::1", """.v4 = ipv6_to_ipv4(.s) ?? "unmapped"""")
    assert(r.getAs[String]("v4") == "unmapped")
  }

  test("ip_pton/ip_ntop roundtrip IPv4 and IPv6") {
    val df = Seq((1L, "192.168.1.200"), (2L, "2001:db8::ff"),
      (3L, "::1")).toDF("id", "s")
    val out = VrlCompiler.run(df, """.rt = ip_ntop!(ip_pton!(.s))""")
      .primary.orderBy("id").select("rt").as[String].collect()
    assert(out(0) == "192.168.1.200")
    // JDK renders uncompressed hextets
    assert(out(1) == "2001:db8:0:0:0:0:0:ff")
    assert(out(2) == "0:0:0:0:0:0:0:1")
  }

  test("ip_pton rejects malformed input") {
    // binary-typed leg wins the coalesce type, so the fallback arrives
    // as bytes
    val r = run1("not-an-ip", """.p = ip_pton(.s) ?? "bad"""")
    assert(new String(r.getAs[Array[Byte]]("p"), "UTF-8") == "bad")
  }

  test("parse_klog extracts the documented fields") {
    val r = run1("E0823 09:07:01.055306  20 scheduler.go:145] oops",
      """.p = parse_klog!(.s)
        |.level = .p.level
        |.id = .p.id
        |.file = .p.file
        |.line = .p.line
        |.message = .p.message""".stripMargin)
    assert(r.getAs[String]("level") == "error")
    assert(r.getAs[Long]("id") == 20L)
    assert(r.getAs[String]("file") == "scheduler.go")
    assert(r.getAs[Long]("line") == 145L)
    assert(r.getAs[String]("message") == "oops")
  }

  test("compact drops null and empty entries from arrays and maps") {
    val df = Seq((1L, Seq[String]("a", null, "", "b"),
      Map[String, String]("k" -> "v", "dead" -> null)))
      .toDF("id", "arr", "m")
    val out = VrlCompiler.run(df,
      """.arr = compact(.arr)
        |.m = compact(.m)""".stripMargin).primary
      .select(size(col("arr")), size(col("m"))).head()
    assert(out.getInt(0) == 2 && out.getInt(1) == 1)
  }

  test("match_any / match_array") {
    val df = Seq((1L, "warning: disk", Seq("alpha", "xray")))
      .toDF("id", "s", "arr")
    val out = VrlCompiler.run(df,
      """.any = match_any(.s, ["^err", "^warn"])
        |.arr_any = match_array(.arr, "^x")
        |.arr_all = match_array(.arr, "^x", all: true)""".stripMargin)
      .primary.head()
    assert(out.getAs[Boolean]("any"))
    assert(out.getAs[Boolean]("arr_any"))
    assert(!out.getAs[Boolean]("arr_all"))
  }

  test("uuid_from_friendly_id decodes base62 to the canonical form") {
    // encode a known UUID in base62, then decode through the function
    val uuid = java.util.UUID.fromString("0196b2a3-86f4-7dd7-ae0b-cc8eabcdef12")
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    var acc = new java.math.BigInteger(1, bb.array())
    val alphabet =
      "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    val sb = new StringBuilder
    val base = java.math.BigInteger.valueOf(62)
    while (acc.signum() > 0) {
      val Array(q, r) = acc.divideAndRemainder(base)
      sb.insert(0, alphabet(r.intValue())); acc = q
    }
    val r = run1(sb.toString, """.u = uuid_from_friendly_id!(.s)""")
    assert(r.getAs[String]("u") == uuid.toString)
  }

  test("encrypt/decrypt roundtrip through the registry") {
    val r = run1("attack at dawn",
      """.ct = encrypt!(.s, "AES-128-CBC-PKCS7", "sixteen byte key", iv: "init vector 16 b")
        |.rt = decrypt!(.ct, "AES-128-CBC-PKCS7", "sixteen byte key", iv: "init vector 16 b")
        |.rt = to_string(.rt)""".stripMargin)
    assert(r.getAs[String]("rt") == "attack at dawn")
  }

  test("random_bytes yields n bytes; random_int stays in range") {
    val out = VrlCompiler.run(one("x"),
      """.rb = random_bytes(8)
        |.ri = random_int(5, 10)""".stripMargin).primary
      .select(length(col("rb")), col("ri")).head()
    assert(out.getInt(0) == 8)
    assert(out.getLong(1) >= 5L && out.getLong(1) < 10L)
  }

  test("type predicates on static and variant values") {
    val r = run1("""{"a": 1, "b": "x"}""",
      """.v = parse_json!(.s)
        |.is_obj = is_object(.v)
        |.is_int = is_integer(.v.a)
        |.is_str = is_string(.v.b)
        |.str_not_int = is_integer(.s)
        |.nullish = is_nullish("-")""".stripMargin)
    assert(r.getAs[Boolean]("is_obj"))
    assert(r.getAs[Boolean]("is_int"))
    assert(r.getAs[Boolean]("is_str"))
    assert(!r.getAs[Boolean]("str_not_int"))
    assert(r.getAs[Boolean]("nullish"))
  }
}
