package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{DatadogSearch, Vrl}

/** Oracle-checked queries for the VRL function surface (SURVEY §2.7) and
  * the condition layer (§2.2). Parse-family queries are ROUND-TRIP
  * oracles: Spark synthesizes a log line from columns, parses it back
  * with the graft parser, and the oracle computes the expected fields
  * directly from the source columns — any parser defect breaks equality.
  */
object VrlQueries {

  import Queries.Q

  private def ev(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "events")
      .withColumn("k", Graft.jsonLong(col("props"), "k"))

  val queries: Map[String, Q] = Map(
    "vrl_strings" -> { (s, dir) =>
      ev(s, dir).select(
        col("event_id"),
        Vrl.upcase(col("event_type")).as("up"),
        Vrl.downcase(Vrl.upcase(col("event_type"))).as("down"),
        Vrl.replaceAll(col("props"), "[0-9]+", "N").as("repl"),
        Vrl.slice(col("event_type"), 0, 3).as("sliced"),
        Vrl.containsStr(col("event_type"), "err").as("has_err"),
        Vrl.startsWith(col("event_type"), "s").as("sw"),
        Vrl.endsWith(col("event_type"), "e").as("ew"),
        Vrl.truncate(col("props"), 10).as("trunc"),
        Vrl.joinArr(Vrl.splitStr(col("event_type"), "r"), "|").as("sj"),
        Vrl.strlen(col("props")).as("len"))
        .orderBy(col("event_id"))
    },

    "vrl_parse_kv" -> { (s, dir) =>
      val line = concat(lit("type="), col("event_type"),
        lit(" k="), col("k"), lit(" host=h"), col("user_id"))
      Queries.withParsed(ev(s, dir), Vrl.parseKeyValue(line)) { parsed => Seq(
        col("event_id"),
        element_at(parsed, "type").as("ptype"),
        element_at(parsed, "k").cast("long").as("pk"),
        element_at(parsed, "host").as("phost"))
      }.orderBy(col("event_id"))
    },

    "vrl_syslog" -> { (s, dir) =>
      val line = concat(lit("<"), col("k"), lit(">host"), col("user_id"),
        lit(" app"), pmod(col("user_id"), lit(5)), lit("["), col("k") + 1,
        lit("]: "), col("event_type"), lit(" happened"))
      val p = Vrl.parseSyslog3164(line)
      ev(s, dir).select(
        col("event_id"),
        p.getField("facility").as("facility"),
        p.getField("severity").as("severity"),
        p.getField("hostname").as("hostname"),
        p.getField("appname").as("appname"),
        p.getField("procid").as("procid"),
        p.getField("message").as("message"))
        .orderBy(col("event_id"))
    },

    "vrl_common_log" -> { (s, dir) =>
      val line = concat(lit("h"), col("user_id"),
        lit(" - frank [10/Oct/2000:13:55:36 -0700] \"GET /page/"), col("k"),
        lit(" HTTP/1.0\" "), lit(200) + pmod(col("k"), lit(4)), lit(" "),
        col("k") * 10)
      val p = Vrl.parseCommonLog(line)
      ev(s, dir).select(
        col("event_id"),
        p.getField("host").as("host"),
        p.getField("method").as("method"),
        p.getField("path").as("path"),
        p.getField("status").as("status"),
        p.getField("size").as("size"))
        .orderBy(col("event_id"))
    },

    "vrl_codec" -> { (s, dir) =>
      ev(s, dir).select(
        col("event_id"),
        Vrl.encodeBase64(col("event_type")).as("b64"),
        Vrl.decodeBase64(Vrl.encodeBase64(col("event_type"))).as("rt"),
        Vrl.encodeHex(col("event_type")).as("hexv"),
        Vrl.md5Hex(col("props")).as("md5v"),
        Vrl.sha2Hex(col("event_type")).as("sha256v"))
        .orderBy(col("event_id"))
    },

    "vrl_timestamp" -> { (s, dir) =>
      ev(s, dir).select(
        col("event_id"),
        Vrl.formatTimestamp(col("ts"), "yyyy-MM-dd HH").as("fmt"),
        year(col("ts")).as("y"),
        month(col("ts")).as("mo"),
        dayofmonth(col("ts")).as("d"),
        hour(col("ts")).as("h"),
        (dayofweek(col("ts")) - 1).as("dow"),
        Vrl.toUnixTimestamp(col("ts")).as("unix_s"),
        Vrl.fromUnixTimestamp(Vrl.toUnixTimestamp(col("ts"))).as("rt_ts"))
        .orderBy(col("event_id"))
    },

    "vrl_ip" -> { (s, dir) =>
      val ip = concat_ws(".", lit(10), pmod(col("user_id"), lit(256)),
        pmod(col("user_id") * 7, lit(256)), pmod(col("user_id") * 13, lit(256)))
      ev(s, dir).select(
        col("event_id"),
        ip.as("ip"),
        Vrl.ipAton(ip).as("ip_num"),
        Vrl.ipNtoa(Vrl.ipAton(ip)).as("ip_rt"),
        Vrl.ipCidrContains("10.64.0.0/10", ip).as("in_cidr"),
        Vrl.ipSubnet(ip, 24).as("subnet"))
        .orderBy(col("event_id"))
    },

    "vrl_number" -> { (s, dir) =>
      ev(s, dir).select(
        col("event_id"),
        Vrl.absNum(col("value") - 100.0).as("absv"),
        Vrl.ceilNum(col("value")).cast("double").as("ceilv"),
        Vrl.floorNum(col("value")).cast("double").as("floorv"),
        Vrl.modNum(col("k"), lit(7)).as("modv"),
        Vrl.parseInt(lit("42")).as("pi"),
        Vrl.parseFloat(lit("3.5")).as("pf"),
        Vrl.parseDurationSecs(lit("1h30m15s")).as("dur"))
        .orderBy(col("event_id"))
    },

    "vrl_grok" -> { (s, dir) =>
      val level = when(col("event_type") === "error", "ERROR").otherwise("INFO")
      val line = format_string("%s 10.0.%d.%d u%d /api/%d %d.5",
        level, pmod(col("user_id"), lit(256)),
        pmod(col("user_id") * 3, lit(256)), col("user_id"), col("k"), col("k"))
      val p = functions.Grok.parse(line,
        "%{LOGLEVEL:level} %{IP:client} %{USER:user} %{URIPATH:path} %{NUMBER:dur}")
      ev(s, dir).select(
        col("event_id"),
        p.getField("level").as("level"),
        p.getField("client").as("client"),
        p.getField("user").as("user"),
        p.getField("path").as("path"),
        p.getField("dur").cast("double").as("dur"))
        .orderBy(col("event_id"))
    },

    "vrl_parse_logs2" -> { (s, dir) =>
      val ae = Vrl.parseApacheErrorLog(format_string(
        "[Wed Oct 11 14:32:52 2000] [core:error] [pid %d] [client 10.0.0.%d] %s msg",
        col("k"), pmod(col("user_id"), lit(256)), col("event_type")))
      val gl = Vrl.parseGlog(format_string(
        "E1011 14:32:52.123456 %d file%d.cc:%d] %s",
        col("k"), col("user_id"), pmod(col("k"), lit(100)), col("event_type")))
      val ng = Vrl.parseNginxLog(format_string(
        "10.1.2.3 - u%d [10/Oct/2000:13:55:36 -0700] \"GET /p/%d HTTP/1.1\" %d %d \"http://r/%d\" \"UA %d\"",
        col("user_id"), col("k"), lit(200) + pmod(col("k"), lit(4)),
        col("k") * 10, col("user_id"), col("user_id")))
      ev(s, dir).select(
        col("event_id"),
        ae.getField("module").as("ae_module"),
        ae.getField("level").as("ae_level"),
        ae.getField("pid").as("ae_pid"),
        ae.getField("client").as("ae_client"),
        ae.getField("message").as("ae_msg"),
        gl.getField("level").as("gl_level"),
        gl.getField("thread_id").as("gl_thread"),
        gl.getField("file").as("gl_file"),
        gl.getField("line").as("gl_line"),
        gl.getField("message").as("gl_msg"),
        ng.getField("status").as("ng_status"),
        ng.getField("size").as("ng_size"),
        ng.getField("referer").as("ng_referer"),
        ng.getField("agent").as("ng_agent"))
        .orderBy(col("event_id"))
    },

    "vrl_case" -> { (s, dir) =>
      val snake = concat(col("event_type"), lit("_demo_case"))
      val domain = concat(lit("svc"), pmod(col("user_id"), lit(3)),
        lit(".example.co.uk"))
      // words tokenized ONCE; each case form derives from the column
      ev(s, dir)
        .withColumn("__ws", Vrl.caseWords(snake))
        .select(
          col("event_id"),
          Vrl.camelcaseOf(col("__ws")).as("camel"),
          Vrl.pascalcaseOf(col("__ws")).as("pascal"),
          array_join(col("__ws"), "-").as("kebab"),
          upper(array_join(col("__ws"), "_")).as("screaming"),
          Vrl.snakecase(Vrl.pascalcaseOf(col("__ws"))).as("snake_rt"),
          Vrl.levenshteinDist(col("event_type"), lit("error")).as("lev"),
          Vrl.parseEtldPlusOne(domain).as("etld"),
          Vrl.parseEtldPlusOne(concat(lit("web"), pmod(col("user_id"), lit(5)),
            lit(".example.com"))).as("etld2"),
          size(Vrl.parseTokens(
            concat(lit("a \"b c\" [d e] f"), col("k")))).as("n_tokens"))
        .orderBy(col("event_id"))
    },

    "vrl_vpc_flow" -> { (s, dir) =>
      val line = format_string(
        "2 12345678 eni-%d 10.0.0.%d 10.0.1.%d %d 443 6 %d %d 1600000000 1600000060 ACCEPT OK",
        col("user_id"), pmod(col("user_id"), lit(256)),
        pmod(col("user_id") * 7, lit(256)),
        lit(1024) + pmod(col("k"), lit(60000)), col("k"), col("k") * 100)
      val p = Vrl.parseVpcFlowLog(line)
      ev(s, dir).select(
        col("event_id"),
        p.getField("version").as("version"),
        p.getField("interface_id").as("interface_id"),
        p.getField("srcaddr").as("srcaddr"),
        p.getField("srcport").as("srcport"),
        p.getField("dstport").as("dstport"),
        p.getField("packets").as("packets"),
        p.getField("bytes").as("bytes"),
        p.getField("action").as("action"))
        .orderBy(col("event_id"))
    },

    "vrl_useragent" -> { (s, dir) =>
      // concat, not format_string: format_string is an interpreted
      // per-row Formatter call, concat stays in codegen
      val edgV = (lit(100) + pmod(col("k"), lit(20))).cast("string")
      val ua = when(pmod(col("user_id"), lit(5)) === 0,
          concat(lit("Mozilla/5.0 (Windows NT 10.0) Chrome/"),
            (lit(90) + pmod(col("k"), lit(30))).cast("string"),
            lit(".0 Safari/537")))
        .when(pmod(col("user_id"), lit(5)) === 1,
          concat(lit("Mozilla/5.0 (Macintosh; Mac OS X 10_15) Firefox/"),
            (lit(80) + pmod(col("k"), lit(40))).cast("string"), lit(".0")))
        .when(pmod(col("user_id"), lit(5)) === 2,
          concat(lit("Mozilla/5.0 (Linux; Android 11) Chrome/"),
            (lit(95) + pmod(col("k"), lit(10))).cast("string"), lit(".0 Mobile")))
        // real Edge UA shape: Chrome token PRECEDES Edg — exercises the
        // derivative-browser priority in parseUserAgent
        .when(pmod(col("user_id"), lit(5)) === 3,
          concat(lit("Mozilla/5.0 (Windows NT 10.0) Chrome/"), edgV,
            lit(".0 Safari/537.36 Edg/"), edgV, lit(".0")))
        .otherwise(lit("curl/7.88.1"))
      // materialize the synthesized UA, then the parsed struct, each in
      // its own projection: without the barriers the CASE synthesis is
      // inlined ~20× and the regex struct 5× into the output exprs
      // (CollapseProject keeps an alias referenced many times by a
      // non-cheap producer in its own stage)
      Queries.withParsed(
        ev(s, dir).withColumn("__ua", ua)
          .withColumn("__g", Vrl.userAgentTokens(col("__ua"))),
        Vrl.parseUserAgentFrom(col("__ua"), col("__g"))) { p => Seq(
        col("event_id"),
        p.getField("browser_family").as("browser_family"),
        p.getField("browser_major").as("browser_major"),
        p.getField("os_family").as("os_family"))
      }.orderBy(col("event_id"))
    },

    "vrl_codec2" -> { (s, dir) =>
      val payload = col("props").cast("binary")
      // compression roundtrips are O(deflate) per row — a 1-in-20 sample
      // proves codec correctness without dominating the bench
      ev(s, dir).filter(pmod(col("event_id"), lit(20)) === 0).select(
        col("event_id"),
        (Vrl.decodeGzip(Vrl.encodeGzip(payload)).cast("string") === col("props"))
          .as("rt_gzip"),
        (Vrl.decodeZlib(Vrl.encodeZlib(payload)).cast("string") === col("props"))
          .as("rt_zlib"),
        (Vrl.decodeSnappy(Vrl.encodeSnappy(payload)).cast("string") === col("props"))
          .as("rt_snappy"),
        (Vrl.decodeZstd(Vrl.encodeZstd(payload)).cast("string") === col("props"))
          .as("rt_zstd"))
        .orderBy(col("event_id"))
    },

    // AES roundtrips with fixed key/iv: ciphertext LENGTHS are recomputed
    // by the oracle per mode (CBC pads to the block, CTR is length-
    // preserving, GCM appends a 16-byte tag) and a wrong-key GCM decrypt
    // must fail to null (authenticated mode)
    "vrl_crypto" -> { (s, dir) =>
      val key16 = lit("0123456789abcdef".getBytes("UTF-8"))
      val key32 = lit("0123456789abcdef0123456789abcdef".getBytes("UTF-8"))
      val altKey32 = lit("fedcba9876543210fedcba9876543210".getBytes("UTF-8"))
      val iv = lit("fedcba9876543210".getBytes("UTF-8"))
      val gcmIv = lit("feedfacedead".getBytes("UTF-8")) // 96-bit nonce
      ev(s, dir)
        .select(col("event_id"), col("props"),
          col("props").cast("binary").as("pt"))
        .withColumn("ct_cbc",
          Vrl.encryptAes(col("pt"), lit("AES-128-CBC-PKCS7"), key16, iv))
        .withColumn("ct_ctr",
          Vrl.encryptAes(col("pt"), lit("AES-256-CTR"), key32, iv))
        .withColumn("ct_gcm",
          Vrl.encryptAes(col("pt"), lit("AES-256-GCM"), key32, gcmIv))
        .select(
          col("event_id"),
          (Vrl.decryptAes(col("ct_cbc"), lit("AES-128-CBC-PKCS7"), key16, iv)
            .cast("string") === col("props")).as("rt_cbc"),
          length(col("ct_cbc")).cast("long").as("len_cbc"),
          (Vrl.decryptAes(col("ct_ctr"), lit("AES-256-CTR"), key32, iv)
            .cast("string") === col("props")).as("rt_ctr"),
          length(col("ct_ctr")).cast("long").as("len_ctr"),
          (Vrl.decryptAes(col("ct_gcm"), lit("AES-256-GCM"), key32, gcmIv)
            .cast("string") === col("props")).as("rt_gcm"),
          length(col("ct_gcm")).cast("long").as("len_gcm"),
          Vrl.decryptAes(col("ct_gcm"), lit("AES-256-GCM"), altKey32, gcmIv)
            .isNull.as("wrong_key_fails"))
        .orderBy(col("event_id"))
    },

    "vrl_xml" -> { (s, dir) =>
      val xml = concat(lit("<event><type>"), col("event_type"),
        lit("</type><k>"), col("k"),
        lit("</k><user><id>"), col("user_id"),
        lit("</id><name>u"), col("user_id"),
        lit("</name></user></event>"))
      Queries.withParsed(ev(s, dir), Vrl.parseXml(xml,
        "type STRING, k BIGINT, user STRUCT<id: BIGINT, name: STRING>")) {
        p => Seq(
          col("event_id"),
          p.getField("type").as("xtype"),
          p.getField("k").as("xk"),
          p.getField("user").getField("id").as("xuid"),
          p.getField("user").getField("name").as("xuname"))
      }.orderBy(col("event_id"))
    },

    "condition_datadog" -> { (s, dir) =>
      val search = DatadogSearch(
        fields = Map(
          "event_type" -> col("event_type"),
          "value" -> col("value"),
          "user_id" -> col("user_id")),
        default = col("props"))
      val cond = search.compile(
        "event_type:error OR (value:>150 NOT event_type:signup) OR event_type:p*")
      ev(s, dir).filter(cond)
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id"))
    },

    // The VRL source→Column COMPILER (functions/VrlCompiler.scala): one
    // program text exercising assignment, parse_json + variant paths,
    // `??` coalescing, if/else-if/else, string/number/hash functions,
    // fallible `!` calls, conditional `abort`, and `del` — compiled to
    // native Column expressions and checked against a hand-written
    // DuckDB mirror of the program's semantics.
    "vrl_compile" -> { (s, dir) =>
      graft.functions.VrlCompiler.run(Graft.table(s, dir, "events"), VrlProgram)
        .primary.orderBy(col("event_id"))
    },

    // abort/drop routing of the same program: the dropped leg carries
    // the ORIGINAL events (remap.rs reroute_dropped semantics)
    "vrl_compile_dropped" -> { (s, dir) =>
      graft.functions.VrlCompiler.run(Graft.table(s, dir, "events"), VrlProgram)
        .dropped.select(col("event_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    },

    // Round-5 long-tail registry entries, compiled from VRL source over
    // documents: redact, sieve, tally+get, reverse, the lz4/snappy/zstd
    // codec roundtrips, and a proto encode→parse roundtrip (reference
    // functions/{redact,sieve,tally,reverse,encode_lz4,…}.cue). The
    // compression and proto legs are identity roundtrips, so the oracle
    // pins them to the source column — a wire-format bug surfaces as a
    // hash mismatch.
    "vrl_longtail" -> { (s, dir) =>
      graft.functions.VrlCompiler
        .run(Graft.table(s, dir, "documents"), VrlLongTailProgram)
        .primary
        .select(col("doc_id"), col("red"), col("sv"), col("tcount"),
          col("rwords"), col("lz"), col("sn"), col("zs"),
          col("pname"), col("pcount"))
        .orderBy(col("doc_id"))
    },

    // Round-trip oracles for the round-5b log-format parsers: klog,
    // AWS ALB access log, CloudWatch Logs subscription envelope, and
    // quote/bracket-aware tokenization (reference functions/
    // parse_klog.cue, parse_aws_alb_log.cue,
    // parse_aws_cloudwatch_log_subscription_message.cue, parse_tokens.cue).
    "vrl_parse_logs3" -> { (s, dir) =>
      val lvl = element_at(
        array(lit("I"), lit("W"), lit("E"), lit("F")),
        pmod(col("user_id"), lit(4)).cast("int") + 1)
      val kline = concat(lvl, lit("1011 14:32:52.123456  "), col("k"),
        lit(" main"), col("user_id"), lit(".go:"), pmod(col("k"), lit(100)),
        lit("] "), col("event_type"), lit(" done"))
      val alb = concat(
        lit("https 2022-10-11T14:32:52.000000Z app/lb/1 10.0.0."),
        pmod(col("user_id"), lit(256)), lit(":"),
        lit(10000) + pmod(col("k"), lit(50000)),
        lit(" 10.0.1.5:80 0.001 0.002 0.000 "),
        lit(200) + pmod(col("k"), lit(4)),
        lit(" 200 "), col("k"), lit(" "), col("k") * 2,
        lit(" \"GET https://example.com:443/p/"), col("k"),
        lit(" HTTP/2.0\" \"Mozilla/5.0 UA"), col("user_id"),
        lit("\" ECDHE-RSA-AES128-GCM-SHA256 TLSv1.2 arn:tg/"),
        col("user_id"), lit(" \"Root=1-"), col("k"),
        lit("\" \"example.com\" \"arn:cert\" "),
        pmod(col("user_id"), lit(10)),
        lit(" 2022-10-11T14:32:52.000000Z \"forward\" \"-\" \"-\""))
      val cw = concat(
        lit("{\"owner\":\"111122223333\",\"messageType\":\"DATA_MESSAGE\"," +
          "\"logGroup\":\"g"), pmod(col("user_id"), lit(5)),
        lit("\",\"logStream\":\"s"), col("user_id"),
        lit("\",\"subscriptionFilters\":[\"f0\",\"f"),
        pmod(col("user_id"), lit(3)),
        lit("\"],\"logEvents\":[{\"id\":\"e"), col("k"),
        lit("\",\"timestamp\":"), lit(1600000000000L) + col("k"),
        lit(",\"message\":\"m-"), col("event_type"), lit("\"}]}"))
      val toks = Vrl.parseTokens(concat(
        lit("start \"quo ted "), col("user_id"), lit("\" [br "),
        col("k"), lit("] tail")))
      val base = ev(s, dir)
        .withColumn("__kl", Vrl.klogTokens(kline))
        .withColumn("__alb", Vrl.albTokens(alb))
        .withColumn("__cw", Vrl.parseCloudwatchSubscription(cw))
      val kl = Vrl.parseKlogFrom(col("__kl"))
      val ab = Vrl.parseAwsAlbLogFrom(col("__alb"))
      base.select(
        col("event_id"),
        kl.getField("level").as("kl_level"),
        kl.getField("id").as("kl_id"),
        kl.getField("file").as("kl_file"),
        kl.getField("line").as("kl_line"),
        kl.getField("message").as("kl_msg"),
        ab.getField("client_host").as("alb_client"),
        ab.getField("elb_status_code").as("alb_status"),
        ab.getField("received_bytes").as("alb_rb"),
        ab.getField("sent_bytes").as("alb_sb"),
        ab.getField("request_method").as("alb_method"),
        ab.getField("request_url").as("alb_url"),
        ab.getField("request_protocol").as("alb_proto"),
        ab.getField("user_agent").as("alb_ua"),
        ab.getField("trace_id").as("alb_trace"),
        ab.getField("domain_name").as("alb_domain"),
        ab.getField("matched_rule_priority").as("alb_rule"),
        ab.getField("actions_executed").as("alb_actions"),
        ab.getField("redirect_url").as("alb_redirect"),
        round(ab.getField("target_processing_time"), 3).as("alb_tpt"),
        col("__cw").getField("owner").as("cw_owner"),
        col("__cw").getField("message_type").as("cw_type"),
        col("__cw").getField("log_group").as("cw_group"),
        col("__cw").getField("log_stream").as("cw_stream"),
        size(col("__cw").getField("subscription_filters")).cast("long")
          .as("cw_nfilters"),
        element_at(col("__cw").getField("log_events"), 1)
          .getField("id").as("cw_eid"),
        unix_millis(element_at(col("__cw").getField("log_events"), 1)
          .getField("timestamp")).as("cw_ets"),
        element_at(col("__cw").getField("log_events"), 1)
          .getField("message").as("cw_emsg"),
        size(toks).cast("long").as("n_tokens"),
        element_at(toks, 2).as("token2"))
        .orderBy(col("event_id"))
    },

    // Syslog level/facility coercions, the IPv6 address family,
    // enumerate/match helpers, radix formatting, and type predicates
    // (reference functions/{to_syslog_level,to_syslog_facility,
    // to_syslog_severity,ip_to_ipv6,ipv6_to_ipv4,ip_pton,ip_ntop,
    // compact,match_any,match_array,format_int,is_nullish,is_ipv4,
    // is_ipv6,is_json}.cue).
    "vrl_misc" -> { (s, dir) =>
      val sev = pmod(col("user_id"), lit(8))
      val fac = pmod(col("user_id"), lit(24))
      val ip4 = concat(lit("10.0."), pmod(col("user_id"), lit(256)),
        lit("."), pmod(col("k"), lit(250)) + 1)
      val v6lit = concat(lit("2001:db8::"),
        lower(conv(pmod(col("k"), lit(256)).cast("string"), 10, 16)))
      val lvl = Vrl.toSyslogLevel(sev)
      ev(s, dir).select(
        col("event_id"),
        lvl.as("lvl"),
        Vrl.toSyslogSeverity(lvl).as("sev_rt"),
        Vrl.toSyslogFacility(fac).as("fac"),
        Vrl.ipToIpv6(ip4).as("v6"),
        Vrl.ipv6ToIpv4(Vrl.ipToIpv6(ip4)).as("rt4"),
        lower(hex(Vrl.ipPton(ip4))).as("p4hex"),
        lower(hex(Vrl.ipPton(v6lit))).as("p6hex"),
        Vrl.ipNtop(Vrl.ipPton(ip4)).as("ntop_rt"),
        array_join(Vrl.compactArr(
          array(col("event_type"), lit(null).cast("string"), lit(""),
            lit("x"))), ",").as("cjoin"),
        Vrl.matchAny(col("event_type"), Seq("^err", "^pur")).as("many"),
        Vrl.matchArray(split(concat(col("event_type"), lit(" xray")), " "),
          "^x").as("marr"),
        Vrl.formatInt(col("k"), 16).as("f16"),
        Vrl.formatInt(col("user_id"), 2).as("f2"),
        Vrl.isNullish(nullif(col("event_type"), lit("error"))).as("nsh"),
        Vrl.isIpv4Str(ip4).as("ip4ok"),
        Vrl.isIpv4Str(concat(lit("10.0.0."),
          lit(300) + pmod(col("k"), lit(10)))).as("ip4bad"),
        Vrl.isIpv6Str(v6lit).as("ip6ok"),
        graft.functions.JsonValidate(col("props")).as("isj"),
        graft.functions.JsonValidate(col("event_type")).as("isj2"))
        .orderBy(col("event_id"))
    },

    // validate_json_schema (vector 0.49, VRL release-notes 0.50
    // semantics): 1/3 of rows carry a type violation, high-k rows a
    // `maximum` violation — boolean result + the collected errors on
    // the error channel, both oracle-compared string-exact.
    "vrl_json_schema" -> { (s, dir) =>
      val schemaPath = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_vjs_schema.json")
      java.nio.file.Files.write(schemaPath,
        ("""{"type":"object","required":["k"],"properties":""" +
         """{"k":{"type":"integer","maximum":80}},""" +
         """"additionalProperties":false}""").getBytes("UTF-8"))
      val in = ev(s, dir).select(
        col("event_id"),
        when(pmod(col("k"), lit(3)) === 0,
          concat(lit("{\"k\": \""), col("k"), lit("\"}")))
          .otherwise(col("props")).as("s"))
      graft.functions.VrlCompiler.run(in,
        s""".valid, .err = validate_json_schema(.s, "$schemaPath")""")
        .primary
        .select(col("event_id"), col("valid"), col("err"))
        .orderBy(col("event_id"))
    },

    // Round-6 long-tail: haversine, shannon_entropy, charset + CBOR
    // roundtrips, all through the VRL compiler (program above).
    "vrl_longtail2" -> { (s, dir) =>
      graft.functions.VrlCompiler
        .run(ev(s, dir), VrlLongTail2Program)
        .primary
        .select(col("event_id"), col("dist"), col("bear"), col("distmi"),
          col("ent"), col("cs"), col("csl"), col("cbname"), col("cbcount"),
          col("cbtag"))
        .orderBy(col("event_id"))
    },

    // Round-6 stdlib tail: type_of, tally_value, contains_all,
    // parse_regex_all, replace_with (closure), secrets, tag_types
    // _externally, reverse_dns (table form), match_datadog_query, and a
    // 1→N `unnest` emit — one compiled program over `documents`.
    "vrl_longtail3" -> { (s, dir) =>
      graft.functions.VrlCompiler
        .run(Graft.table(s, dir, "documents"), VrlLongTail3Program)
        .primary
        .select(col("doc_id"), col("ty1"), col("ty2"), col("ty3"),
          col("the_n"), col("has"), col("m4n"), col("m4first"), col("rw"),
          col("sec"), col("sec2"), col("tts"), col("rd"), col("dd"),
          col("long_words"),
          col("arr").getField("i").as("i"))
        .orderBy(col("doc_id"), col("i"))
    },

    // parse_dnstap roundtrip: the program assembles a real dnstap
    // protobuf frame (nested Message via encode_proto) per event, then
    // parses it back — the oracle recomputes every envelope field from
    // the source columns, so a wire/enum/address bug breaks the hash.
    "vrl_dnstap" -> { (s, dir) =>
      graft.functions.VrlCompiler
        .run(ev(s, dir), VrlDnstapProgram)
        .primary
        .select(col("event_id"),
          col("dt").getField("dataType").as("data_type"),
          col("dt").getField("dataTypeId").as("data_type_id"),
          col("dt").getField("messageType").as("message_type"),
          col("dt").getField("messageTypeId").as("message_type_id"),
          col("dt").getField("serverId").as("server_id"),
          col("dt").getField("serverVersion").as("server_version"),
          col("dt").getField("socketFamily").as("socket_family"),
          col("dt").getField("socketProtocol").as("socket_protocol"),
          col("dt").getField("sourceAddress").as("source_address"),
          col("dt").getField("sourcePort").as("source_port"),
          col("dt").getField("time").as("t"),
          col("dt").getField("timePrecision").as("tp"))
        .orderBy(col("event_id"))
    }
  )

  /** vrl_longtail3 program (see the query comment above). */
  private val VrlLongTail3Program: String =
    """.ty1 = type_of(.text)
      |.ty2 = type_of(.n_chars)
      |.ty3 = type_of(.missing)
      |.the_n = tally_value(split(.text, " "), "the")
      |.has = contains_all(.text, ["the", "a"])
      |.m4 = parse_regex_all(.text, "\\b(s[a-z]+)\\b")
      |.m4n = length(.m4)
      |.m4first = .m4[0].g1 ?? ""
      |.rw = replace_with(.text, "\\b(the)\\b") -> |m| { "<" + m.captures[0] + ">" }
      |set_secret("src", .source)
      |.sec = get_secret("src")
      |remove_secret("src")
      |.sec2 = get_secret("src") ?? "gone"
      |.tt = tag_types_externally(.source)
      |.tts = .tt.string
      |.rd = reverse_dns("10.0.0.1", table: {"10.0.0.1": "db.internal"})
      |.dd = match_datadog_query(., "source:src1 OR source:src2")
      |lw = 0
      |for_each(split(.text, " ")) -> |_i, w| {
      |  if length(w) > 3 { lw = lw + 1 }
      |}
      |.long_words = lw
      |.arr = [{"i": 1}, {"i": 2}]
      |. = unnest(.arr)
      |""".stripMargin

  /** vrl_dnstap program (see the query comment above). */
  private val VrlDnstapProgram: String =
    """.ip4 = "10." + to_string(.user_id % 200) + "." + to_string(.k % 250) + "." + to_string(.event_id % 250)
      |.qaddr = ip_pton(.ip4)
      |.innerb = encode_proto({"type": 5, "socket_family": 1, "socket_protocol": 1, "query_address": .qaddr, "query_port": .k % 60000, "query_time_sec": 1667909880 + .k}, "1:varint:type;2:varint:socket_family;3:varint:socket_protocol;4:bytes:query_address;6:varint:query_port;8:varint:query_time_sec")
      |.frame = encode_proto({"identity": "graft-agent", "version": "0.1", "message": .innerb, "type": 1}, "1:string:identity;2:string:version;14:bytes:message;15:varint:type")
      |.dt = parse_dnstap(.frame)
      |""".stripMargin

  /** Round-6 long-tail program: haversine, shannon_entropy, charset and
    * CBOR roundtrips (reference release notes 0.44-0.45 + the published
    * function docs: haversine returns {distance, bearing};
    * shannon_entropy is base-2 over the character distribution;
    * decode_charset/encode_charset; parse_cbor/encode_cbor). The charset
    * and CBOR legs are identity roundtrips pinned to the source column
    * by the oracle — a wire-format bug surfaces as a hash mismatch.
    */
  private val VrlLongTail2Program: String =
    """.lat2 = .value / 4.0 - 10.0
      |.lon2 = to_float(.user_id % 360) - 180.0
      |.hav = haversine(40.7, -74.0, .lat2, .lon2)
      |.dist = round(.hav.distance, 4)
      |.bear = round(.hav.bearing, 4)
      |.havmi = haversine(40.7, -74.0, .lat2, .lon2, measurement_system: "imperial")
      |.distmi = round(.havmi.distance, 4)
      |.ent = round(shannon_entropy(.props), 6)
      |.cs = decode_charset(encode_charset(.event_type, "UTF-16"), "UTF-16")
      |.csl = decode_charset(encode_charset(.event_type, "ISO-8859-1"), "ISO-8859-1")
      |.rec = { "name": .event_type, "count": .k, "tags": ["a", "b"] }
      |.cb = parse_cbor(encode_cbor(.rec))
      |.cbname = to_string(.cb.name) ?? ""
      |.cbcount = to_int(.cb.count) ?? -1
      |.cbtag = to_string(.cb.tags[1]) ?? ""
      |""".stripMargin

  /** vrl_longtail program (see the query comment above). */
  private val VrlLongTailProgram: String =
    """.red = redact(.text, filters: ["ipsum", "\\d+"])
      |.sv = sieve(.text, "[a-z]", replace_single: "_", replace_repeated: "_")
      |.tcount = get(tally(split(.text, " ")), "the") ?? 0
      |.rwords = join!(reverse(split(.text, " ")), " ")
      |.lz = decode_lz4(encode_lz4(.text))
      |.sn = decode_snappy(encode_snappy(.text))
      |.zs = decode_zstd(encode_zstd(.text))
      |.rec = { "name": .source, "count": .n_chars }
      |.back = parse_proto(encode_proto(.rec, "1:string:name;2:varint:count"), "1:string:name;2:varint:count")
      |.pname = .back.name
      |.pcount = .back.count
      |""".stripMargin

  /** The vrl_compile program — VRL source text, parsed+compiled at plan
    * build time (shape: lib/vector-vrl/tests/tests/example.vrl).
    */
  private val VrlProgram: String =
    """# graft vrl_compile oracle program
      |.etype = upcase!(.event_type)
      |.parsed = parse_json!(.props)
      |.k = to_int(.parsed.k) ?? -1
      |if .value >= 75.0 { .tier = "high" }
      |else if .value >= 25.0 { .tier = "mid" }
      |else { .tier = "low" }
      |.tag = downcase(.etype) + ":" + to_string(.k)
      |.vbucket = floor(.value / 10.0)
      |.digest = md5(.tag)
      |.plen = strlen(.props)
      |.day = format_timestamp!(.ts, "%Y-%m-%d")
      |if .etype == "ERROR" && .k % 2 == 0 { abort }
      |del(.props)
      |del(.parsed)
      |del(.ts)
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "vrl_strings" ->
      """SELECT event_id,
        |  upper(event_type) AS up, lower(upper(event_type)) AS down,
        |  regexp_replace(props, '[0-9]+', 'N', 'g') AS repl,
        |  substr(event_type, 1, 3) AS sliced,
        |  contains(event_type, 'err') AS has_err,
        |  starts_with(event_type, 's') AS sw,
        |  ends_with(event_type, 'e') AS ew,
        |  substr(props, 1, 10) AS trunc,
        |  array_to_string(string_split(event_type, 'r'), '|') AS sj,
        |  CAST(length(props) AS INT) AS len
        |FROM events ORDER BY event_id""".stripMargin,

    "vrl_parse_kv" ->
      """SELECT event_id, event_type AS ptype,
        |  CAST(json_extract_string(props,'$.k') AS BIGINT) AS pk,
        |  'h' || CAST(user_id AS VARCHAR) AS phost
        |FROM events ORDER BY event_id""".stripMargin,

    "vrl_syslog" ->
      """SELECT event_id,
        |  CAST(k // 8 AS INT) AS facility, CAST(k % 8 AS INT) AS severity,
        |  'host' || CAST(user_id AS VARCHAR) AS hostname,
        |  'app' || CAST(user_id % 5 AS VARCHAR) AS appname,
        |  k + 1 AS procid,
        |  event_type || ' happened' AS message
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "vrl_common_log" ->
      """SELECT event_id,
        |  'h' || CAST(user_id AS VARCHAR) AS host, 'GET' AS method,
        |  '/page/' || CAST(k AS VARCHAR) AS path,
        |  CAST(200 + k % 4 AS INT) AS status, k * 10 AS size
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "vrl_codec" ->
      """SELECT event_id,
        |  base64(encode(event_type)) AS b64,
        |  event_type AS rt,
        |  lower(hex(encode(event_type))) AS hexv,
        |  md5(props) AS md5v,
        |  sha256(event_type) AS sha256v
        |FROM events ORDER BY event_id""".stripMargin,

    "vrl_timestamp" ->
      """SELECT event_id,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H') AS fmt,
        |  CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS mo,
        |  CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
        |  CAST(dayofweek(ts) AS INT) AS dow,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS unix_s,
        |  CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)))) AS TIMESTAMP) AS rt_ts
        |FROM events ORDER BY event_id""".stripMargin,

    "vrl_ip" ->
      """WITH t AS (
        |  SELECT event_id,
        |    user_id % 256 AS o2, (user_id*7) % 256 AS o3, (user_id*13) % 256 AS o4
        |  FROM events)
        |SELECT event_id,
        |  '10.' || o2 || '.' || o3 || '.' || o4 AS ip,
        |  10*16777216 + o2*65536 + o3*256 + o4 AS ip_num,
        |  '10.' || o2 || '.' || o3 || '.' || o4 AS ip_rt,
        |  (10*16777216 + o2*65536 + o3*256 + o4) // 4194304 = 41 AS in_cidr,
        |  '10.' || o2 || '.' || o3 || '.0' AS subnet
        |FROM t ORDER BY event_id""".stripMargin,

    "vrl_number" ->
      """SELECT event_id,
        |  abs(value - 100.0) AS absv,
        |  CAST(ceil(value) AS DOUBLE) AS ceilv,
        |  CAST(floor(value) AS DOUBLE) AS floorv,
        |  CAST(json_extract_string(props,'$.k') AS BIGINT) % 7 AS modv,
        |  CAST(42 AS BIGINT) AS pi, CAST(3.5 AS DOUBLE) AS pf,
        |  CAST(3600 + 30*60 + 15 AS DOUBLE) AS dur
        |FROM events ORDER BY event_id""".stripMargin,

    "vrl_grok" ->
      """SELECT event_id,
        |  CASE WHEN event_type='error' THEN 'ERROR' ELSE 'INFO' END AS level,
        |  '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.'
        |    || CAST((user_id*3) % 256 AS VARCHAR) AS client,
        |  'u' || CAST(user_id AS VARCHAR) AS user,
        |  '/api/' || CAST(k AS VARCHAR) AS path,
        |  CAST(k AS DOUBLE) + 0.5 AS dur
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "vrl_parse_logs2" ->
      """SELECT event_id,
        |  'core' AS ae_module, 'error' AS ae_level, k AS ae_pid,
        |  '10.0.0.' || CAST(user_id % 256 AS VARCHAR) AS ae_client,
        |  event_type || ' msg' AS ae_msg,
        |  'error' AS gl_level, k AS gl_thread,
        |  'file' || CAST(user_id AS VARCHAR) || '.cc' AS gl_file,
        |  k % 100 AS gl_line, event_type AS gl_msg,
        |  CAST(200 + k % 4 AS INT) AS ng_status, k * 10 AS ng_size,
        |  'http://r/' || CAST(user_id AS VARCHAR) AS ng_referer,
        |  'UA ' || CAST(user_id AS VARCHAR) AS ng_agent
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "vrl_case" ->
      """WITH t AS (
        |  SELECT event_id, event_type, user_id,
        |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k,
        |    string_split(event_type || '_demo_case', '_') AS parts
        |  FROM events),
        |c AS (
        |  SELECT *,
        |    [upper(p[1:1]) || p[2:] for p in parts] AS caps
        |  FROM t)
        |SELECT event_id,
        |  parts[1] || array_to_string(caps[2:], '') AS camel,
        |  array_to_string(caps, '') AS pascal,
        |  array_to_string(parts, '-') AS kebab,
        |  upper(array_to_string(parts, '_')) AS screaming,
        |  array_to_string(parts, '_') AS snake_rt,
        |  CAST(levenshtein(event_type, 'error') AS INT) AS lev,
        |  'example.co.uk' AS etld,
        |  'example.com' AS etld2,
        |  CAST(4 AS INT) AS n_tokens
        |FROM c ORDER BY event_id""".stripMargin,

    "vrl_vpc_flow" ->
      """SELECT event_id,
        |  CAST(2 AS INT) AS version,
        |  'eni-' || CAST(user_id AS VARCHAR) AS interface_id,
        |  '10.0.0.' || CAST(user_id % 256 AS VARCHAR) AS srcaddr,
        |  CAST(1024 + k % 60000 AS INT) AS srcport,
        |  CAST(443 AS INT) AS dstport,
        |  k AS packets, k * 100 AS bytes, 'ACCEPT' AS action
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "vrl_useragent" ->
      """SELECT event_id,
        |  CASE user_id % 5 WHEN 0 THEN 'Chrome' WHEN 1 THEN 'Firefox'
        |    WHEN 2 THEN 'Chrome' WHEN 3 THEN 'Edge' END AS browser_family,
        |  CAST(CASE user_id % 5 WHEN 0 THEN 90 + k % 30
        |    WHEN 1 THEN 80 + k % 40 WHEN 2 THEN 95 + k % 10
        |    WHEN 3 THEN 100 + k % 20 END AS INT)
        |    AS browser_major,
        |  CASE user_id % 5 WHEN 0 THEN 'Windows' WHEN 1 THEN 'Mac OS X'
        |    WHEN 2 THEN 'Android' WHEN 3 THEN 'Windows' END AS os_family
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "vrl_codec2" ->
      """SELECT event_id, true AS rt_gzip, true AS rt_zlib,
        |  true AS rt_snappy, true AS rt_zstd
        |FROM events WHERE event_id % 20 = 0 ORDER BY event_id""".stripMargin,

    "vrl_crypto" ->
      """SELECT event_id,
        |  true AS rt_cbc,
        |  CAST((strlen(props) // 16 + 1) * 16 AS BIGINT) AS len_cbc,
        |  true AS rt_ctr,
        |  CAST(strlen(props) AS BIGINT) AS len_ctr,
        |  true AS rt_gcm,
        |  CAST(strlen(props) + 16 AS BIGINT) AS len_gcm,
        |  true AS wrong_key_fails
        |FROM events ORDER BY event_id""".stripMargin,

    "vrl_xml" ->
      """SELECT event_id, event_type AS xtype,
        |  CAST(json_extract_string(props,'$.k') AS BIGINT) AS xk,
        |  user_id AS xuid,
        |  'u' || CAST(user_id AS VARCHAR) AS xuname
        |FROM events ORDER BY event_id""".stripMargin,

    "condition_datadog" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_type = 'error'
        |   OR (value > 150 AND NOT event_type = 'signup')
        |   OR event_type LIKE 'p%'
        |ORDER BY event_id""".stripMargin,

    // hand-written DuckDB mirror of VrlProgram's semantics
    "vrl_compile" ->
      """WITH base AS (
        |  SELECT event_id, user_id, event_type, value, props, ts,
        |    upper(event_type) AS etype,
        |    coalesce(CAST(json_extract_string(props,'$.k') AS BIGINT), -1) AS k
        |  FROM events)
        |SELECT event_id, user_id, event_type, value, etype, k,
        |  CASE WHEN value >= 75.0 THEN 'high'
        |       WHEN value >= 25.0 THEN 'mid' ELSE 'low' END AS tier,
        |  lower(etype) || ':' || CAST(k AS VARCHAR) AS tag,
        |  CAST(floor(value / 10.0) AS BIGINT) AS vbucket,
        |  md5(lower(etype) || ':' || CAST(k AS VARCHAR)) AS digest,
        |  length(props) AS plen,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
        |FROM base
        |WHERE NOT (etype = 'ERROR' AND k % 2 = 0)
        |ORDER BY event_id""".stripMargin,

    "vrl_compile_dropped" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE upper(event_type) = 'ERROR'
        |  AND coalesce(CAST(json_extract_string(props,'$.k') AS BIGINT), -1) % 2 = 0
        |ORDER BY event_id""".stripMargin,

    "vrl_longtail" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(text, 'ipsum', '[REDACTED]', 'g'),
        |                 '\d+', '[REDACTED]', 'g') AS red,
        |  regexp_replace(text, '[^a-z]+', '_', 'g') AS sv,
        |  CAST(len(list_filter(str_split(text, ' '), x -> x = 'the')) AS BIGINT) AS tcount,
        |  array_to_string(list_reverse(str_split(text, ' ')), ' ') AS rwords,
        |  text AS lz, text AS sn, text AS zs,
        |  source AS pname, n_chars AS pcount
        |FROM documents ORDER BY doc_id""".stripMargin,

    "vrl_parse_logs3" ->
      """SELECT event_id,
        |  CASE user_id % 4 WHEN 0 THEN 'info' WHEN 1 THEN 'warning'
        |       WHEN 2 THEN 'error' ELSE 'fatal' END AS kl_level,
        |  k AS kl_id,
        |  'main' || CAST(user_id AS VARCHAR) || '.go' AS kl_file,
        |  k % 100 AS kl_line,
        |  event_type || ' done' AS kl_msg,
        |  '10.0.0.' || CAST(user_id % 256 AS VARCHAR) || ':' ||
        |    CAST(10000 + k % 50000 AS VARCHAR) AS alb_client,
        |  200 + k % 4 AS alb_status,
        |  k AS alb_rb, k * 2 AS alb_sb,
        |  'GET' AS alb_method,
        |  'https://example.com:443/p/' || CAST(k AS VARCHAR) AS alb_url,
        |  'HTTP/2.0' AS alb_proto,
        |  'Mozilla/5.0 UA' || CAST(user_id AS VARCHAR) AS alb_ua,
        |  'Root=1-' || CAST(k AS VARCHAR) AS alb_trace,
        |  'example.com' AS alb_domain,
        |  user_id % 10 AS alb_rule,
        |  'forward' AS alb_actions,
        |  CAST(NULL AS VARCHAR) AS alb_redirect,
        |  CAST(0.002 AS DOUBLE) AS alb_tpt,
        |  '111122223333' AS cw_owner, 'DATA_MESSAGE' AS cw_type,
        |  'g' || CAST(user_id % 5 AS VARCHAR) AS cw_group,
        |  's' || CAST(user_id AS VARCHAR) AS cw_stream,
        |  CAST(2 AS BIGINT) AS cw_nfilters,
        |  'e' || CAST(k AS VARCHAR) AS cw_eid,
        |  1600000000000 + k AS cw_ets,
        |  'm-' || event_type AS cw_emsg,
        |  CAST(4 AS BIGINT) AS n_tokens,
        |  'quo ted ' || CAST(user_id AS VARCHAR) AS token2
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "vrl_misc" ->
      """WITH t AS (SELECT *,
        |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |  FROM events),
        |b AS (SELECT *,
        |    user_id % 8 AS sev, user_id % 24 AS facn,
        |    '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' ||
        |      CAST(k % 250 + 1 AS VARCHAR) AS ip4,
        |    printf('%x', k % 256) AS hx
        |  FROM t)
        |SELECT event_id,
        |  list_extract(['emerg','alert','crit','err','warning','notice',
        |    'info','debug'], CAST(sev AS INT) + 1) AS lvl,
        |  sev AS sev_rt,
        |  list_extract(['kern','user','mail','daemon','auth','syslog','lpr',
        |    'news','uucp','cron','authpriv','ftp','ntp','security','console',
        |    'solaris-cron','local0','local1','local2','local3','local4',
        |    'local5','local6','local7'], CAST(facn AS INT) + 1) AS fac,
        |  '::ffff:' || ip4 AS v6,
        |  ip4 AS rt4,
        |  printf('%02x%02x%02x%02x', 10, 0, user_id % 256, k % 250 + 1)
        |    AS p4hex,
        |  '20010db8' || repeat('0', 20) || lpad(hx, 4, '0') AS p6hex,
        |  ip4 AS ntop_rt,
        |  event_type || ',x' AS cjoin,
        |  (event_type LIKE 'err%' OR event_type LIKE 'pur%') AS many,
        |  true AS marr,
        |  printf('%x', k) AS f16,
        |  bin(user_id) AS f2,
        |  (event_type = 'error') AS nsh,
        |  true AS ip4ok, false AS ip4bad, true AS ip6ok,
        |  true AS isj, false AS isj2
        |FROM b ORDER BY event_id""".stripMargin,

    "vrl_json_schema" ->
      """WITH t AS (SELECT *,
        |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN k % 3 = 0 OR k > 80 THEN false ELSE true END AS valid,
        |  CASE WHEN k % 3 = 0 THEN
        |    'function call error for "validate_json_schema" at (15:69): ' ||
        |    'JSON schema validation failed: "' || CAST(k AS VARCHAR) ||
        |    '" is not of type "integer" at /k'
        |  WHEN k > 80 THEN
        |    'function call error for "validate_json_schema" at (15:69): ' ||
        |    'JSON schema validation failed: ' || CAST(k AS VARCHAR) ||
        |    ' is greater than the maximum of 80 at /k'
        |  ELSE NULL END AS err
        |FROM t ORDER BY event_id""".stripMargin,

    "vrl_longtail2" ->
      """WITH t AS (SELECT *,
        |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |  FROM events),
        |b AS (SELECT *,
        |    value / 4.0 - 10.0 AS lat2,
        |    CAST(user_id % 360 AS DOUBLE) - 180.0 AS lon2
        |  FROM t),
        |h AS (SELECT *,
        |    pow(sin(radians(lat2 - 40.7) / 2), 2) +
        |      cos(radians(40.7)) * cos(radians(lat2)) *
        |      pow(sin(radians(lon2 + 74.0) / 2), 2) AS hava,
        |    degrees(atan2(
        |      sin(radians(lon2 + 74.0)) * cos(radians(lat2)),
        |      cos(radians(40.7)) * sin(radians(lat2)) -
        |        sin(radians(40.7)) * cos(radians(lat2)) *
        |        cos(radians(lon2 + 74.0)))) AS brg
        |  FROM b)
        |SELECT event_id,
        |  round(2 * 6371.0 * asin(sqrt(hava)), 4) AS dist,
        |  round((brg + 360.0) % 360.0, 4) AS bear,
        |  round(2 * 6371.0 * 0.621371 * asin(sqrt(hava)), 4) AS distmi,
        |  round((SELECT entropy(ch)
        |         FROM unnest(string_split(props, '')) AS u(ch)), 6) AS ent,
        |  event_type AS cs,
        |  event_type AS csl,
        |  event_type AS cbname,
        |  k AS cbcount,
        |  'b' AS cbtag
        |FROM h ORDER BY event_id""".stripMargin,

    "vrl_longtail3" ->
      """WITH per AS (
        |  SELECT doc_id,
        |    'string' AS ty1, 'integer' AS ty2, 'null' AS ty3,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'the')) AS BIGINT) AS the_n,
        |    (contains(text, 'the') AND contains(text, 'a')) AS has,
        |    CAST(len(regexp_extract_all(text, '\b(s[a-z]+)\b')) AS BIGINT) AS m4n,
        |    coalesce(regexp_extract_all(text, '\b(s[a-z]+)\b', 1)[1], '') AS m4first,
        |    regexp_replace(text, '\b(the)\b', '<\1>', 'g') AS rw,
        |    source AS sec, 'gone' AS sec2, source AS tts,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> length(w) > 3)) AS BIGINT) AS long_words,
        |    'db.internal' AS rd,
        |    (source = 'src1' OR source = 'src2') AS dd
        |  FROM documents)
        |SELECT p.*, i.i
        |FROM per p CROSS JOIN
        |  (SELECT CAST(1 AS BIGINT) AS i UNION ALL SELECT CAST(2 AS BIGINT)) i
        |ORDER BY doc_id, i""".stripMargin,

    "vrl_dnstap" ->
      """WITH t AS (SELECT *,
        |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_id,
        |  'Message' AS data_type, CAST(1 AS BIGINT) AS data_type_id,
        |  'ClientQuery' AS message_type, CAST(5 AS BIGINT) AS message_type_id,
        |  'graft-agent' AS server_id, '0.1' AS server_version,
        |  'INET' AS socket_family, 'UDP' AS socket_protocol,
        |  '10.' || CAST(user_id % 200 AS VARCHAR) || '.' ||
        |    CAST(k % 250 AS VARCHAR) || '.' ||
        |    CAST(event_id % 250 AS VARCHAR) AS source_address,
        |  k % 60000 AS source_port,
        |  1667909880 + k AS t,
        |  's' AS tp
        |FROM t ORDER BY event_id""".stripMargin
  )
}
