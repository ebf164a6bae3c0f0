package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

/** End-to-end VRL source → Column compilation, mirroring the reference's
  * remap/VRL examples (website/cue/reference/remap/expressions/ and
  * lib/vector-vrl/tests/tests/example.vrl).
  */
class VrlCompilerSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, "click", 42.5, "alice", """{"k": 7}"""),
    (2L, "error", 7.25, "bob", """{"k": 9}"""),
    (3L, "view", 99.0, null, """{"k": 11}""")
  ).toDF("id", "etype", "value", "user", "props")

  test("example.vrl shape: assignment, ?? coalesce, arithmetic") {
    // mirror of lib/vector-vrl/tests/tests/example.vrl over typed fields
    val out = VrlCompiler.run(events,
      """
        |.foo = "test"
        |.bar = "foo"
        |.baz = (to_int(.user) ?? 0) + 4
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect()
    assert(r.map(_.getAs[String]("foo")).toSeq == Seq("test", "test", "test"))
    // to_int("alice") fails -> null -> ?? 0 -> + 4
    assert(r.map(_.getAs[Long]("baz")).toSeq == Seq(4L, 4L, 4L))
    assert(out.dropped.count() == 0)
  }

  test("if / else if / else over fields") {
    val out = VrlCompiler.run(events,
      """
        |if .value >= 90.0 { .tier = "high" }
        |else if .value >= 40.0 { .tier = "mid" }
        |else { .tier = "low" }
        |""".stripMargin)
    assert(out.primary.orderBy("id").collect()
      .map(_.getAs[String]("tier")).toSeq == Seq("mid", "low", "high"))
  }

  test("abort drops the event and keeps the original downstream") {
    val out = VrlCompiler.run(events,
      """
        |.marked = true
        |if .etype == "error" { abort }
        |.etype = upcase(.etype)
        |""".stripMargin)
    val prim = out.primary.orderBy("id").collect()
    assert(prim.map(_.getAs[String]("etype")).toSeq == Seq("CLICK", "VIEW"))
    // dropped output carries the ORIGINAL event (no .marked column)
    val dropped = out.dropped.collect()
    assert(dropped.map(_.getAs[String]("etype")).toSeq == Seq("error"))
    assert(!out.dropped.columns.contains("marked"))
  }

  test("fallible call with ! routes errored rows to dropped") {
    val out = VrlCompiler.run(events, ".unum = to_int!(.user)")
    // every .user fails to parse as int ("alice"/"bob"/null)
    assert(out.primary.count() == 0)
    assert(out.dropped.count() == 3)
  }

  test("error-coalescing assignment captures instead of dropping") {
    val out = VrlCompiler.run(events,
      """
        |.unum, .uerr = to_int(.user)
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect()
    assert(out.dropped.count() == 0)
    // VRL semantics: err carries the error MESSAGE, the target gets the
    // expression type's default (0 for to_int)
    assert(r.map(_.getAs[String]("uerr")).forall(m =>
      m != null && m.contains("to_int")))
    assert(r.map(_.getAs[Long]("unum")).toSeq == Seq(0L, 0L, 0L))
  }

  test("variables, del, exists") {
    val out = VrlCompiler.run(events,
      """
        |tmp = upcase(.etype)
        |.loud = tmp + "!"
        |.has_user = exists(.user)
        |del(.props)
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect()
    assert(r.map(_.getAs[String]("loud")).toSeq == Seq("CLICK!", "ERROR!", "VIEW!"))
    assert(r.map(_.getAs[Boolean]("has_user")).toSeq == Seq(true, true, false))
    assert(!out.primary.columns.contains("props"))
  }

  test("string ops, numeric ops, hash functions") {
    val out = VrlCompiler.run(events,
      """
        |.et3 = slice(.etype, 0, 3)
        |.vr = round(.value / 10.0, 1)
        |.digest = md5(.etype)
        |.parts = split("a,b,c", ",")
        |.n = length(.parts)
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect()
    assert(r.head.getAs[String]("et3") == "cli")
    assert(r.head.getAs[Double]("vr") == 4.3)
    assert(r.head.getAs[String]("digest") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("click".getBytes).map("%02x".format(_)).mkString)
    assert(r.head.getAs[Long]("n") == 3L)
  }

  test("parse_json + dynamic path access (variant)") {
    val out = VrlCompiler.run(events,
      """
        |.parsed = parse_json!(.props)
        |.k = to_int(.parsed.k)
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect()
    assert(r.map(_.getAs[Long]("k")).toSeq == Seq(7L, 9L, 11L))
  }

  test("value-producing || treats variant false/null as falsy, 0 truthy") {
    // VRL: falsy = false or null regardless of static type — a variant
    // lhs actually holding boolean false falls through to the rhs; a
    // variant holding int 0 is TRUTHY and is kept (logical.cue)
    val out = VrlCompiler.run(events,
      """
        |.a = to_string(parse_json!("false") || "fell")
        |.b = to_string(parse_json!("0") || "kept")
        |.c = to_string(parse_json!("null") || "nulled")
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect().head
    assert(r.getAs[String]("a") == "fell")
    assert(r.getAs[String]("b") == "0")
    assert(r.getAs[String]("c") == "nulled")
  }

  test("nested path assignment builds structs") {
    val out = VrlCompiler.run(events,
      """
        |.meta.source = "graft"
        |.meta.version = 5
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect().head
    val meta = r.getAs[Row]("meta")
    assert(meta.getAs[String]("source") == "graft")
    assert(meta.getAs[Long]("version") == 5L)
  }

  test("if as expression") {
    val out = VrlCompiler.run(events,
      """
        |.cls = if .value > 50.0 { "big" } else { "small" }
        |""".stripMargin)
    assert(out.primary.orderBy("id").collect()
      .map(_.getAs[String]("cls")).toSeq == Seq("small", "small", "big"))
  }

  test("timestamp format roundtrip (strftime mapping)") {
    val df = Seq((1L, "2024-03-05 10:30:00")).toDF("id", "raw")
    val out = VrlCompiler.run(df,
      """
        |.ts = parse_timestamp!(.raw, "%Y-%m-%d %H:%M:%S")
        |.day = format_timestamp!(.ts, "%Y-%m-%d")
        |.hour = format_timestamp!(.ts, "%H")
        |""".stripMargin)
    val r = out.primary.collect().head
    assert(r.getAs[String]("day") == "2024-03-05")
    assert(r.getAs[String]("hour") == "10")
  }

  test("abort inside else-if chain and comparison chain") {
    val out = VrlCompiler.run(events,
      """
        |if .value < 10.0 { abort }
        |else if .value < 50.0 { .band = "mid" }
        |else { .band = "top" }
        |""".stripMargin)
    val prim = out.primary.orderBy("id").collect()
    assert(prim.map(_.getAs[String]("band")).toSeq == Seq("mid", "top"))
    assert(out.dropped.collect().map(_.getAs[Long]("id")).toSeq == Seq(2L))
  }

  test("array and object literals") {
    val out = VrlCompiler.run(events,
      """
        |.arr = [1, 2, 3]
        |.obj = { "a": 1, "b": "two" }
        |.first = .arr[0]
        |.bval = .obj.b
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect().head
    assert(r.getSeq[Long](r.fieldIndex("arr")).toSeq == Seq(1L, 2L, 3L))
    assert(r.getAs[Long]("first") == 1L)
    assert(r.getAs[String]("bval") == "two")
  }

  test("parse_groks with literal patterns and custom aliases") {
    val df = Seq((1L, "latency 42 ms"), (2L, "took 7")).toDF("id", "line")
    val out = VrlCompiler.run(df,
      """
        |.g = parse_groks(.line, ["%{LAT}", "took %{INT:n}"],
        |  aliases: { "LAT": "latency %{INT:n} ms" })
        |.n = to_int(.g.n)
        |del(.g)
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect()
    assert(r.map(_.getAs[Long]("n")).toSeq == Seq(42L, 7L))
  }

  test("long-tail fns: decode_mime_q, parse_ruby_hash, parse_bytes, uuid_v7") {
    val df = Seq((1L,
      "=?utf-8?Q?hello=20w=C3=B6rld?= and =?utf-8?B?aGkgdGhlcmU=?=",
      """{"a" => 1, "b" => "x"}""",
      "1.5 MiB")).toDF("id", "mime", "rb", "sz")
    val out = VrlCompiler.run(df,
      """
        |.plain = decode_mime_q(.mime)
        |.a = to_int(parse_ruby_hash!(.rb).a)
        |.bytes = parse_bytes!(.sz)
        |.uid = uuid_v7()
        |""".stripMargin)
    val r = out.primary.collect().head
    assert(r.getAs[String]("plain") == "hello wörld and hi there")
    assert(r.getAs[Long]("a") == 1L)
    assert(r.getAs[Long]("bytes") == (1.5 * 1048576).toLong)
    // v7: version nibble at position 14 is '7'
    assert(r.getAs[String]("uid").charAt(14) == '7')
  }

  test("parse_regex exposes named capture groups") {
    val df = Seq((1L, "dur=42ms code=200")).toDF("id", "line")
    val out = VrlCompiler.run(df,
      """
        |.g = parse_regex!(.line, "dur=(?<dur>[0-9]+)ms code=(?<code>[0-9]+)")
        |.dur = to_int(.g.dur)
        |.code = to_int(.g.code)
        |del(.g)
        |""".stripMargin)
    val r = out.primary.collect().head
    assert(r.getAs[Long]("dur") == 42L && r.getAs[Long]("code") == 200L)
  }

  test("parse_csv / encode_csv / sha3 / base16") {
    val df = Seq((1L, "a,\"b,with \"\"quote\"\"\",c")).toDF("id", "line")
    val out = VrlCompiler.run(df,
      """
        |.fields = parse_csv!(.line)
        |.second = .fields[1]
        |.back = encode_csv(.fields)
        |.h3 = sha3(.second)
        |.hx = decode_base16(encode_base16(.second))
        |del(.fields)
        |""".stripMargin)
    val r = out.primary.collect().head
    assert(r.getAs[String]("second") == "b,with \"quote\"")
    assert(r.getAs[String]("back") == "a,\"b,with \"\"quote\"\"\",c")
    // sha3's published default variant is SHA3-512 (sha3.cue,
    // remap.yaml remap_function_sha3)
    assert(r.getAs[String]("h3") ==
      java.security.MessageDigest.getInstance("SHA3-512")
        .digest("b,with \"quote\"".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(r.getAs[String]("hx") == "b,with \"quote\"")
  }

  test("closures: filter and map_values over arrays and maps") {
    val df = Seq((1L, "a,bb,ccc,dddd")).toDF("id", "csv")
    val out = VrlCompiler.run(df,
      """
        |.parts = split(.csv, ",")
        |.long = filter(.parts) -> |_i, v| { length(v) >= 2 }
        |.loud = map_values(.long) -> |v| { upcase(v) }
        |.joined = join!(.loud, "|")
        |del(.parts)
        |del(.long)
        |del(.loud)
        |""".stripMargin)
    val r = out.primary.collect().head
    assert(r.getAs[String]("joined") == "BB|CCC|DDDD")
  }

  test("root assignment: `. = {...}` replaces, `. = [...]` emits 1-to-N") {
    val replace = VrlCompiler.run(events,
      """
        |. = { "kind": upcase(.etype), "double": .value * 2.0 }
        |""".stripMargin)
    val rr = replace.primary.orderBy("kind").collect()
    assert(replace.primary.columns.toSeq == Seq("kind", "double"))
    assert(rr.map(_.getAs[String]("kind")).toSeq == Seq("CLICK", "ERROR", "VIEW"))

    val emit = VrlCompiler.run(events,
      """
        |. = [{ "message": "hello", "src": .etype }, { "message": "world" }]
        |""".stripMargin)
    val er = emit.primary.collect()
    assert(er.length == 6) // 3 input rows × 2 emitted events
    assert(er.count(_.getAs[String]("message") == "hello") == 3)
    assert(er.count(r => r.getAs[String]("message") == "world" &&
      r.isNullAt(r.fieldIndex("src"))) == 3)
  }

  test("unnest emits one event per array element, other fields copied") {
    val out = VrlCompiler.run(events,
      """
        |.tag = upcase(.etype)
        |.arr = [{ "i": 1 }, { "i": 2 }, { "i": 3 }]
        |. = unnest(.arr)
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect()
    assert(r.length == 9) // 3 rows × 3 elements
    val first = r.filter(_.getAs[Long]("id") == 1L)
    assert(first.map(_.getAs[Row]("arr").getAs[Long]("i")).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(first.forall(_.getAs[String]("tag") == "CLICK"))
  }

  test("secrets: set/get/remove against the __secrets map") {
    val out = VrlCompiler.run(events,
      """
        |set_secret("token", .user)
        |.t1 = get_secret("token")
        |set_secret("token", "rotated")
        |.t2 = get_secret("token")
        |remove_secret("token")
        |.t3 = get_secret("token") ?? "absent"
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect()
    assert(r.map(_.getAs[String]("t1")).toSeq == Seq("alice", "bob", null))
    assert(r.map(_.getAs[String]("t2")).toSeq ==
      Seq("rotated", "rotated", "rotated"))
    assert(r.map(_.getAs[String]("t3")).toSeq ==
      Seq("absent", "absent", "absent"))
  }

  test("replace_with maps each match through the closure") {
    val out = VrlCompiler.run(events,
      """
        |.r = replace_with(.etype, "([aeiou])") -> |m| { "<" + m.captures[0] + ">" }
        |.whole = replace_with(.etype, "ck|rr") -> |m| { upcase(m.string) }
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect()
    assert(r.map(_.getAs[String]("r")).toSeq ==
      Seq("cl<i>ck", "<e>rr<o>r", "v<i><e>w"))
    assert(r.map(_.getAs[String]("whole")).toSeq ==
      Seq("cliCK", "eRRor", "view"))
  }

  test("type_of resolves static and null types") {
    val out = VrlCompiler.run(events,
      """
        |.t1 = type_of(.etype)
        |.t2 = type_of(.value)
        |.t3 = type_of(.id)
        |.t4 = type_of(.missing)
        |.t5 = type_of(parse_json(.props))
        |""".stripMargin)
    val r = out.primary.orderBy("id").head()
    assert(r.getAs[String]("t1") == "string")
    assert(r.getAs[String]("t2") == "float")
    assert(r.getAs[String]("t3") == "integer")
    assert(r.getAs[String]("t4") == "null")
    assert(r.getAs[String]("t5") == "object")
  }

  test("parse_dnstap decodes a nested-message frame") {
    val out = VrlCompiler.run(events,
      """
        |.inner = encode_proto({ "type": 6, "socket_family": 2, "socket_protocol": 2, "response_port": 53, "response_time_sec": 1700000000 }, "1:varint:type;2:varint:socket_family;3:varint:socket_protocol;7:varint:response_port;12:varint:response_time_sec")
        |.frame = encode_proto({ "identity": "ns1", "version": "9.18", "message": .inner, "type": 1 }, "1:string:identity;2:string:version;14:bytes:message;15:varint:type")
        |.dt = parse_dnstap(.frame)
        |""".stripMargin)
    val dt = out.primary.orderBy("id").head().getAs[Row]("dt")
    assert(dt.getAs[String]("dataType") == "Message")
    assert(dt.getAs[String]("messageType") == "ClientResponse")
    assert(dt.getAs[String]("socketFamily") == "INET6")
    assert(dt.getAs[String]("socketProtocol") == "TCP")
    assert(dt.getAs[Long]("responsePort") == 53L)
    // response (even type id) → time from the response_* side
    assert(dt.getAs[Long]("time") == 1700000000L)
  }

  test("parse_dnstap decodes the DNS wire message (requestData)") {
    // hand-assembled RFC 1035 response: id 0x1234, flags 0x8180
    // (qr rd ra), 1 question (example.com A IN), 2 answers — an A record
    // and a CNAME whose rdata uses a compression pointer back to the
    // question name
    val dnsHex = "123481800001000200000000" +
      "076578616d706c6503636f6d0000010001" +
      "c00c000100010000012c00045db8d822" +
      "c00c000500010000012c000603777777c00c"
    // frame assembled byte-by-byte (decode_base16 can't round-trip
    // arbitrary binary through the string layer): Message{type=5,
    // socket_family=1, query_message=dns} wrapped in Dnstap{message, type=1}
    val dns = dnsHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val inner = Array[Byte](0x08, 5, 0x10, 1, 0x52, dns.length.toByte) ++ dns
    val frame = Array[Byte](0x72, inner.length.toByte) ++ inner ++
      Array[Byte](0x78, 1)
    import org.apache.spark.sql.functions.{col, lit}
    val dt = spark.range(1).select(lit(frame).as("frame"))
      .select(Vrl.parseDnstap(col("frame")).as("dt"))
      .head().getAs[Row]("dt")
    val req = dt.getAs[Row]("requestData")
    val hdr = req.getAs[Row]("header")
    assert(hdr.getAs[Long]("id") == 0x1234L)
    assert(hdr.getAs[Long]("qr") == 1L)
    assert(hdr.getAs[Boolean]("rd") && hdr.getAs[Boolean]("ra"))
    assert(!hdr.getAs[Boolean]("aa"))
    assert(hdr.getAs[Long]("qdCount") == 1L && hdr.getAs[Long]("anCount") == 2L)
    val q = req.getSeq[Row](1)
    assert(q.head.getAs[String]("domainName") == "example.com")
    assert(q.head.getAs[String]("questionType") == "A")
    assert(q.head.getAs[String]("class") == "IN")
    val ans = req.getSeq[Row](2)
    assert(ans(0).getAs[String]("recordType") == "A")
    assert(ans(0).getAs[String]("rData") == "93.184.216.34")
    assert(ans(0).getAs[Long]("ttl") == 300L)
    assert(ans(1).getAs[String]("recordType") == "CNAME")
    assert(ans(1).getAs[String]("rData") == "www.example.com")
    assert(ans(1).getAs[String]("domainName") == "example.com")
    // responseData absent: no response_message in the frame
    assert(dt.getAs[Row]("responseData") == null)
  }

  test("for_each over an array accumulates into enclosing variables") {
    val out = VrlCompiler.run(events,
      """
        |parts = split(.etype, "")
        |count = 0
        |glued = ""
        |for_each(parts) -> |_i, ch| {
        |  if ch != "" {
        |    count = count + 1
        |    glued = glued + ch
        |  }
        |}
        |.n_chars = count
        |.glued = upcase(glued)
        |""".stripMargin)
    val r = out.primary.orderBy("id").collect()
    assert(r.map(_.getAs[Long]("n_chars")).toSeq == Seq(5L, 5L, 4L))
    assert(r.map(_.getAs[String]("glued")).toSeq ==
      Seq("CLICK", "ERROR", "VIEW"))
  }

  test("for_each over an object sees keys and conditional accumulation") {
    val out = VrlCompiler.run(events,
      """
        |kv = parse_key_value!("a=1 b=2 skip=9 c=3", "=", " ")
        |total = 0
        |keys = ""
        |for_each(kv) -> |k, v| {
        |  if k != "skip" {
        |    total = total + (to_int(v) ?? 0)
        |    keys = keys + k
        |  }
        |}
        |.total = total
        |.keys = keys
        |""".stripMargin)
    val r = out.primary.orderBy("id").head()
    assert(r.getAs[Long]("total") == 6L)
    assert(r.getAs[String]("keys") == "abc")
  }

  test("for_each rejects event-field assignment in the closure") {
    intercept[VrlCompiler.VrlCompileException] {
      VrlCompiler.compile(events.schema,
        """
          |for_each(split(.etype, "")) -> |_i, ch| { .out = ch }
          |""".stripMargin)
    }
  }

  test("parse error surfaces as VrlParseException") {
    intercept[VrlParser.VrlParseException] {
      VrlCompiler.compile(events.schema, ".x = @bad")
    }
  }

  test("unknown function surfaces as compile exception") {
    intercept[VrlCompiler.VrlCompileException] {
      VrlCompiler.compile(events.schema, ".x = no_such_fn(.etype)")
    }
  }
}
