package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 long-tail VRL functions, exercised through the VRL compiler
  * where the registry wires them (reference docs under
  * website/cue/reference/remap/functions/).
  */
class VrlLongTailSpec extends SparkSpec {
  import spark.implicits._

  private def one(s: String) = Seq((1L, s)).toDF("id", "s")

  private def run1(input: String, program: String): org.apache.spark.sql.Row =
    VrlCompiler.run(one(input), program).primary.head()

  test("redact masks SSNs and raw patterns") {
    val r = run1("ssn 123-45-6789 card 4111",
      """.s = redact(.s, filters: ["us_social_security_number", "4\\d{3}"])""")
    assert(r.getAs[String]("s") == "ssn [REDACTED] card [REDACTED]")
  }

  test("sieve keeps permitted runs, collapses the rest") {
    val r = run1("a1!!b2??c3",
      """.kept = sieve(.s, "[a-z0-9]", replace_repeated: "_")""")
    assert(r.getAs[String]("kept") == "a1_b2_c3")
  }

  test("tally and object_from_array") {
    val df = Seq((1L, Seq("a", "b", "a", "c", "a"))).toDF("id", "arr")
    val out = VrlCompiler.run(df, """.t = tally(.arr)""").primary
      .select(element_at(col("t"), "a"), element_at(col("t"), "b")).head()
    assert(out.getLong(0) == 3L && out.getLong(1) == 1L)

    val p = Seq((1L, Seq(Seq("k1", "v1"), Seq("k2", "v2")))).toDF("id", "pairs")
    val m = VrlCompiler.run(p, """.m = object_from_array(.pairs)""").primary
      .select(element_at(col("m"), "k2")).as[String].head()
    assert(m == "v2")
  }

  test("unflatten nests dotted keys") {
    val df = Seq((1L, Map("a.b" -> "1", "a.c" -> "x", "d" -> "true")))
      .toDF("id", "m")
    val out = VrlCompiler.run(df, """.n = unflatten(.m)""").primary
      .selectExpr("cast(variant_get(n, '$.a.b') as long)",
        "cast(variant_get(n, '$.a.c') as string)",
        "cast(variant_get(n, '$.d') as boolean)").head()
    assert(out.getLong(0) == 1L)
    assert(out.getString(1) == "x")
    assert(out.getBoolean(2))
  }

  test("community_id is order-independent and seed-sensitive") {
    val df = Seq(
      (1L, "10.0.0.1", "10.0.0.2", 6, 1234, 80),
      (2L, "10.0.0.2", "10.0.0.1", 6, 80, 1234)
    ).toDF("id", "sip", "dip", "proto", "sport", "dport")
    val ids = VrlCompiler.run(df,
      """.cid = community_id(.sip, .dip, .proto, .sport, .dport)""")
      .primary.orderBy("id").select("cid").as[String].collect()
    assert(ids(0) == ids(1))
    assert(ids(0).startsWith("1:"))
    val seeded = VrlCompiler.run(df,
      """.cid = community_id(.sip, .dip, .proto, .sport, .dport, seed: 1)""")
      .primary.select("cid").as[String].head()
    assert(seeded != ids(0))
  }

  test("lz4 / snappy / zstd roundtrip through the registry") {
    for (codec <- Seq("lz4", "snappy", "zstd")) {
      val r = run1("the quick brown fox jumps over the lazy dog",
        s""".back = decode_$codec(encode_$codec(.s))""")
      assert(r.getAs[String]("back") ==
        "the quick brown fox jumps over the lazy dog", codec)
    }
  }

  test("proto roundtrip via parse_proto/encode_proto") {
    val df = Seq((1L, "svc-a", 42L, 2.5)).toDF("id", "name", "count", "score")
    val out = VrlCompiler.run(df,
      """
        |.rec = { "name": .name, "count": .count, "score": .score }
        |.wire = encode_proto(.rec, "1:string:name;2:varint:count;3:double:score")
        |.back = parse_proto(.wire, "1:string:name;2:varint:count;3:double:score")
        |""".stripMargin).primary
      .select("back.name", "back.count", "back.score").head()
    assert(out.getString(0) == "svc-a")
    assert(out.getLong(1) == 42L)
    assert(out.getDouble(2) == 2.5)
  }

  test("parse_linux_authorization and parse_influxdb wire through") {
    val auth = run1("<38>Aug 12 09:00:01 host1 sshd[999]: Accepted publickey for root",
      """.p = parse_linux_authorization(.s)""")
    val p = auth.getAs[org.apache.spark.sql.Row]("p")
    assert(p.getAs[String]("appname") == "sshd")

    val influx = run1("cpu,host=h1 usage=0.5 1700000000000000000",
      """.m = parse_influxdb(.s)""")
    assert(influx.getAs[org.apache.spark.sql.Row]("m")
      .getAs[String]("measurement") == "cpu")
  }

  test("assert_eq null-routes failures under !") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val out = VrlCompiler.run(df, """.ok = assert_eq!(.v, "a")""")
    assert(out.primary.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(out.dropped.count() == 1)
  }

  test("zip and reverse registry entries") {
    val df = Seq((1L, Seq("a", "b"), Seq("x", "y"))).toDF("id", "l", "r")
    val z = VrlCompiler.run(df, """.z = zip(.l, .r)""").primary
      .selectExpr("z[1].l", "z[1].r").head()
    assert(z.getString(0) == "b" && z.getString(1) == "y")
    val rev = VrlCompiler.run(df, """.rv = reverse(.l)""").primary
      .selectExpr("rv[0]").as[String].head()
    assert(rev == "b")
  }

  test("get_env_var resolves at compile time") {
    val r = run1("x", """.home = get_env_var("HOME")""")
    assert(r.getAs[String]("home") == sys.env("HOME"))
  }
}
