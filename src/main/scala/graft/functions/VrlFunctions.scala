package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The VRL stdlib surface exposed to [[VrlCompiler]] — maps VRL function
  * names onto the existing Column-level implementations in [[Vrl]] /
  * [[Grok]] (reference: the function list under
  * /root/reference/website/cue/reference/remap/functions/ and
  * lib/vector-vrl — names and arities follow the published docs).
  *
  * Constant-requiring parameters (regex patterns, separators, formats)
  * must be literal in the program text — same restriction the reference
  * compiler enforces for e.g. parse_regex patterns.
  */
object VrlFunctions {
  import VrlCompiler.{CV, TAny, TArr, TBool, TFloat, TInt, TMap, TObj, TStr, TTs, TVariant, VrlCompileException}

  final case class Arg(cv: CV, literal: Option[Any])

  private def str(a: Arg, fn: String, what: String): String = a.literal match {
    case Some(s: String) => s
    case _ => throw VrlCompileException(s"$fn: $what must be a string literal")
  }
  private def int(a: Arg, fn: String, what: String): Long = a.literal match {
    case Some(i: Long) => i
    case _ => throw VrlCompileException(s"$fn: $what must be an integer literal")
  }

  /** chrono strftime → java.time pattern for the common specifiers
    * (VRL timestamps use strftime-style formats; Spark uses java.time).
    */
  private[functions] def strftimeToJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt(i) == '%' && i + 1 < fmt.length) {
        fmt(i + 1) match {
          case 'Y' => sb.append("yyyy"); case 'y' => sb.append("yy")
          case 'm' => sb.append("MM"); case 'd' => sb.append("dd")
          case 'e' => sb.append("d")
          case 'H' => sb.append("HH"); case 'M' => sb.append("mm")
          case 'S' => sb.append("ss")
          case 'b' | 'h' => sb.append("MMM"); case 'B' => sb.append("MMMM")
          case 'a' => sb.append("EEE"); case 'A' => sb.append("EEEE")
          case 'j' => sb.append("DDD")
          case 'z' => sb.append("xx"); case 'Z' => sb.append("zz")
          case 'T' => sb.append("HH:mm:ss")
          case 'F' => sb.append("yyyy-MM-dd")
          case '3' if i + 2 < fmt.length && fmt(i + 2) == 'f' =>
            sb.append("SSS"); i += 1
          case 'f' => sb.append("SSSSSS")
          case '%' => sb.append('%')
          case other => sb.append(other)
        }
        i += 2
      } else {
        // quote java-pattern-significant letters
        if (fmt(i).isLetter) sb.append(s"'${fmt(i)}'") else sb.append(fmt(i))
        i += 1
      }
    }
    sb.toString
  }

  /** "no:type:name;..." → ProtoSchema (see parse_proto/encode_proto). */
  private def protoSchema(spec: String): graft.codecs.ProtobufCodec.ProtoSchema = {
    import graft.codecs.ProtobufCodec._
    ProtoSchema(spec.split(";").toSeq.filter(_.nonEmpty).map { f =>
      f.split(":") match {
        case Array(no, t, nm) =>
          val pt = t match {
            case "varint" => PVarint
            case "sint" => PSint
            case "double" => PDouble
            case "fixed64" => PFixed64
            case "string" => PString
            case "bytes" => PBytes
            case other => throw VrlCompileException(s"parse_proto: unknown type $other")
          }
          ProtoField(no.toInt, nm, pt)
        case _ => throw VrlCompileException(
          s"parse_proto: field spec must be no:type:name, got `$f`")
      }
    })
  }

  def apply(name: String, args: List[Arg], named: Map[String, Arg]): CV = {
    def a(i: Int): Arg = args.lift(i).getOrElse(
      throw VrlCompileException(s"$name: missing argument ${i + 1}"))
    def c(i: Int): Column = a(i).cv.col
    name match {
      // ---- string ----
      case "upcase" => CV(upper(c(0)), TStr)
      case "downcase" => CV(lower(c(0)), TStr)
      case "strip_whitespace" | "trim" => CV(trim(c(0)), TStr)
      case "strip_ansi_escape_codes" => CV(Vrl.stripAnsiEscapeCodes(c(0)), TStr)
      case "length" => a(0).cv.t match {
        case TArr | TMap | TObj(_) => CV(size(c(0)).cast("long"), TInt)
        case _ => CV(length(c(0)).cast("long"), TInt)
      }
      case "strlen" => CV(length(c(0)).cast("long"), TInt)
      case "split" =>
        val sep = str(a(1), name, "separator")
        CV(split(c(0), java.util.regex.Pattern.quote(sep)), TArr)
      case "join" =>
        CV(array_join(c(0), str(a(1), name, "separator")), TStr)
      case "replace" =>
        // VRL string patterns are literal substrings (regex form uses
        // r'..' which our parser surfaces as a plain string; callers
        // needing regex use replace_regex below)
        CV(org.apache.spark.sql.functions.replace(
          c(0), lit(str(a(1), name, "pattern")), lit(str(a(2), name, "with"))), TStr)
      case "replace_regex" =>
        CV(regexp_replace(c(0), str(a(1), name, "pattern"), str(a(2), name, "with")), TStr)
      case "contains" => CV(c(0).contains(c(1)), TBool)
      case "starts_with" => CV(c(0).startsWith(c(1)), TBool)
      case "ends_with" => CV(c(0).endsWith(c(1)), TBool)
      case "slice" =>
        val start = int(a(1), name, "start")
        val end = args.lift(2).map(x => int(x, name, "end"))
        end match {
          case Some(e) => CV(substring(c(0), start.toInt + 1, (e - start).toInt), TStr)
          case None => CV(c(0).substr(lit(start.toInt + 1), length(c(0))), TStr)
        }
      case "truncate" =>
        CV(Vrl.truncate(c(0), int(a(1), name, "limit").toInt,
          named.get("suffix").flatMap(_.literal).contains(true)), TStr)
      case "snakecase" => CV(Vrl.snakecase(c(0)), TStr)
      case "camelcase" => CV(Vrl.camelcase(c(0)), TStr)
      case "pascalcase" => CV(Vrl.pascalcase(c(0)), TStr)
      case "kebabcase" => CV(Vrl.kebabcase(c(0)), TStr)
      case "screamingsnakecase" => CV(Vrl.screamingsnakecase(c(0)), TStr)
      case "match" => CV(c(0).rlike(str(a(1), name, "pattern")), TBool)
      case "find" =>
        CV(Vrl.find(c(0), str(a(1), name, "pattern")), TStr)
      case "levenshtein" => CV(levenshtein(c(0), c(1)).cast("long"), TInt)
      case "format_number" =>
        CV(format_number(c(0), int(a(1), name, "places").toInt), TStr)

      // ---- parse ----
      case "parse_json" => CV(parse_json(c(0)), TVariant)
      case "parse_key_value" =>
        val fs = named.get("field_delimiter").map(x => str(x, name, "field_delimiter")).getOrElse(" ")
        val kv = named.get("key_value_delimiter").map(x => str(x, name, "key_value_delimiter")).getOrElse("=")
        CV(Vrl.parseKeyValue(c(0), fs, kv), TMap)
      case "parse_logfmt" => CV(Vrl.parseKeyValue(c(0)), TMap)
      case "parse_syslog" => CV(Vrl.parseSyslog3164(c(0)), TAny)
      case "parse_common_log" => CV(Vrl.parseCommonLog(c(0)), TAny)
      case "parse_apache_log" =>
        val fm = args.lift(1).map(x => str(x, name, "format")).getOrElse("common")
        if (fm == "error") CV(Vrl.parseApacheErrorLog(c(0)), TAny)
        else CV(Vrl.parseCommonLog(c(0)), TAny)
      case "parse_nginx_log" => CV(Vrl.parseNginxLog(c(0)), TAny)
      case "parse_glog" => CV(Vrl.parseGlog(c(0)), TAny)
      case "parse_user_agent" => CV(Vrl.parseUserAgent(c(0)), TAny)
      case "parse_query_string" => CV(Vrl.parseQueryString(c(0)), TMap)
      case "parse_url" =>
        CV(struct(
          lower(parse_url(c(0), lit("PROTOCOL"))).as("scheme"),
          parse_url(c(0), lit("HOST")).as("host"),
          parse_url(c(0), lit("PATH")).as("path"),
          parse_url(c(0), lit("QUERY")).as("query")), TAny)
      case "parse_duration" =>
        CV(Vrl.parseDurationSecs(c(0)), TFloat)
      case "parse_csv" => CV(Vrl.parseCsvArray(c(0)), TArr)
      case "encode_csv" => CV(Vrl.encodeCsvArray(c(0)), TStr)
      case "parse_cef" => CV(Vrl.parseCef(c(0)), TAny)
      case "parse_xml" =>
        val ddl = named.get("schema").map(x => str(x, name, "schema"))
          .getOrElse(throw VrlCompileException(
            "parse_xml: a literal `schema:` DDL argument is required"))
        CV(Vrl.parseXml(c(0), ddl), TAny)
      case "parse_aws_vpc_flow_log" => CV(Vrl.parseVpcFlowLog(c(0)), TAny)
      case "parse_int" =>
        CV(c(0).try_cast("long"), TInt)
      case "parse_float" =>
        CV(c(0).try_cast("double"), TFloat)
      case "parse_grok" =>
        val aliases = named.get("aliases").flatMap(_.literal) match {
          case Some(m: Map[_, _]) =>
            m.map { case (k, v) => k.toString -> v.toString }
          case _ => Map.empty[String, String]
        }
        CV(Grok.parse(c(0), str(a(1), name, "pattern"), aliases = aliases), TAny)
      case "parse_groks" =>
        val pats = a(1).literal match {
          case Some(l: Seq[_]) => l.map(_.toString)
          case _ => throw VrlCompileException(
            "parse_groks: patterns must be a literal array")
        }
        val aliases = named.get("aliases").flatMap(_.literal) match {
          case Some(m: Map[_, _]) =>
            m.map { case (k, v) => k.toString -> v.toString }
          case _ => Map.empty[String, String]
        }
        CV(Grok.parseFirstOf(c(0), pats, aliases), TAny)
      case "parse_timestamp" =>
        CV(to_timestamp(c(0), strftimeToJava(str(a(1), name, "format"))), TTs)
      case "parse_regex" =>
        // named captures (?<x>…) keep their names; unnamed groups are
        // exposed positionally as g<i> (published fn: named + "0","1",…)
        val pat = str(a(1), name, "pattern")
        val groups = java.util.regex.Pattern.compile(pat).matcher("").groupCount()
        val namedIt = "\\(\\?<([A-Za-z][A-Za-z0-9]*)>".r.findAllMatchIn(pat)
          .map(_.group(1)).toList
        val labels =
          if (namedIt.length == groups) namedIt
          else (1 to groups).map(i => s"g$i").toList
        CV(RegexStruct(c(0), pat, labels), TAny)

      // ---- coerce ----
      case "to_int" => a(0).cv.t match {
        case TBool => CV(c(0).cast("long"), TInt)
        case TTs => CV(unix_timestamp(c(0)), TInt)
        case TVariant => CV(try_variant_get(c(0), "$", "long"), TInt)
        case _ => CV(c(0).try_cast("long"), TInt)
      }
      case "to_float" => a(0).cv.t match {
        case TBool => CV(c(0).cast("int").cast("double"), TFloat)
        case TVariant => CV(try_variant_get(c(0), "$", "double"), TFloat)
        case _ => CV(c(0).try_cast("double"), TFloat)
      }
      case "to_string" => a(0).cv.t match {
        case TVariant => CV(try_variant_get(c(0), "$", "string"), TStr)
        case _ => CV(c(0).cast("string"), TStr)
      }
      case "to_bool" => CV(c(0).try_cast("boolean"), TBool)
      case "is_null" => CV(c(0).isNull, TBool)
      case "is_empty" => a(0).cv.t match {
        case TArr | TMap => CV(size(c(0)) === 0, TBool)
        case _ => CV(length(c(0)) === 0, TBool)
      }
      case "exists" => CV(c(0).isNotNull, TBool)
      // assertions (unit-test conditions, assert.cue/assert_eq.cue):
      // truthy/equal -> true, else null so `!` routes the row as errored
      case "assert" =>
        CV(when(coalesce(c(0), lit(false)), lit(true)), TBool)
      case "assert_eq" =>
        CV(when(c(0) <=> c(1), lit(true)), TBool)

      // type ASSERTIONS (string!/int!/... in reference programs): pass
      // the value through when the static type matches, yield null (=
      // runtime error under `!`) when it cannot match; dynamic values
      // (variant/any) extract-or-null at runtime
      case "string" => a(0).cv.t match {
        case TStr => a(0).cv
        case TVariant => CV(try_variant_get(c(0), "$", "string"), TStr)
        case TAny => CV(c(0).cast("string"), TStr)
        case _ => CV(lit(null).cast("string"), TStr)
      }
      case "int" => a(0).cv.t match {
        case TInt => a(0).cv
        case TVariant => CV(try_variant_get(c(0), "$", "long"), TInt)
        case TAny => CV(c(0).try_cast("long"), TInt)
        case _ => CV(lit(null).cast("long"), TInt)
      }
      case "float" => a(0).cv.t match {
        case TFloat => a(0).cv
        case TVariant => CV(try_variant_get(c(0), "$", "double"), TFloat)
        case TAny => CV(c(0).try_cast("double"), TFloat)
        case _ => CV(lit(null).cast("double"), TFloat)
      }
      case "bool" => a(0).cv.t match {
        case TBool => a(0).cv
        case TVariant => CV(try_variant_get(c(0), "$", "boolean"), TBool)
        case TAny => CV(c(0).try_cast("boolean"), TBool)
        case _ => CV(lit(null).cast("boolean"), TBool)
      }
      case "timestamp" => a(0).cv.t match {
        case TTs => a(0).cv
        case _ => CV(lit(null).cast("timestamp"), TTs)
      }

      // ---- timestamp ----
      case "now" => CV(current_timestamp(), TTs)
      case "format_timestamp" =>
        CV(date_format(c(0), strftimeToJava(str(a(1), name, "format"))), TStr)
      case "to_unix_timestamp" =>
        named.get("unit").flatMap(_.literal) match {
          case Some("milliseconds") =>
            CV((c(0).cast("double") * 1000).cast("long"), TInt)
          case _ => CV(unix_timestamp(c(0)), TInt)
        }
      case "from_unix_timestamp" =>
        named.get("unit").flatMap(_.literal) match {
          case Some("milliseconds") => CV(timestamp_millis(c(0)), TTs)
          case _ => CV(timestamp_seconds(c(0)), TTs)
        }

      // ---- crypto / encode ----
      case "md5" => CV(md5(c(0).cast("binary")), TStr)
      case "sha1" => CV(sha1(c(0).cast("binary")), TStr)
      case "sha2" =>
        val bits = named.get("variant").flatMap(_.literal) match {
          case Some("SHA-224") => 224
          case Some("SHA-384") => 384
          case Some("SHA-512") => 512
          case _ => 256
        }
        CV(sha2(c(0).cast("binary"), bits), TStr)
      case "sha3" =>
        val variant = named.get("variant").flatMap(_.literal) match {
          case Some("SHA3-384") => "SHA3-384"
          case Some("SHA3-512") => "SHA3-512"
          case _ => "SHA3-256"
        }
        CV(Vrl.sha3Hex(variant)(c(0)), TStr)
      case "encode_base16" => CV(lower(hex(c(0).cast("binary"))), TStr)
      case "decode_base16" => CV(unhex(c(0)).cast("string"), TStr)
      case "crc" => CV(crc32(c(0).cast("binary")).cast("string"), TStr)
      case "seahash" | "xxhash" => CV(xxhash64(c(0)), TInt)
      case "hmac" =>
        CV(Vrl.hmacSha256(str(a(1), name, "key"), c(0)), TStr)
      case "encode_base64" => CV(base64(c(0).cast("binary")), TStr)
      case "decode_base64" => CV(unbase64(c(0)).cast("string"), TStr)
      case "encode_json" => CV(to_json(c(0)), TStr)
      case "encode_percent" => CV(url_encode(c(0)), TStr)
      case "decode_percent" => CV(url_decode(c(0)), TStr)
      case "encode_logfmt" => CV(Vrl.encodeLogfmt(c(0)), TStr)
      case "encode_key_value" => CV(Vrl.encodeKeyValue(c(0)), TStr)
      case "encode_gzip" => CV(Vrl.encodeGzip(c(0).cast("binary")), TAny)
      case "decode_gzip" => CV(Vrl.decodeGzip(c(0)).cast("string"), TStr)
      case "encode_zlib" => CV(Vrl.encodeZlib(c(0).cast("binary")), TAny)
      case "decode_zlib" => CV(Vrl.decodeZlib(c(0)).cast("string"), TStr)
      case "encode_charset" =>
        CV(Vrl.encodeCharset(c(0), c(1)), TAny)
      case "decode_charset" =>
        CV(Vrl.decodeCharset(c(0).cast("binary"), c(1)), TStr)
      case "encode_cbor" => CV(Vrl.encodeCbor(c(0)), TAny)
      case "parse_cbor" => CV(Vrl.parseCbor(c(0)), TVariant)
      case "shannon_entropy" => CV(Vrl.shannonEntropy(c(0)), TFloat)
      case "haversine" =>
        val sys = named.get("measurement_system")
          .map(x => str(x, name, "measurement_system")).getOrElse("metric")
        CV(Vrl.haversine(c(0), c(1), c(2), c(3), sys), TObj(
          org.apache.spark.sql.types.StructType.fromDDL(
            "distance DOUBLE, bearing DOUBLE")))

      // ---- ip ----
      case "ip_aton" | "ip_to_int" => CV(Vrl.ipAton(c(0)), TInt)
      case "ip_ntoa" => CV(Vrl.ipNtoa(c(0)), TStr)
      case "ip_cidr_contains" =>
        CV(Vrl.ipCidrContains(str(a(0), name, "cidr"), c(1)), TBool)
      case "ip_subnet" =>
        CV(Vrl.ipSubnet(c(0), int(a(1), name, "prefix").toInt), TStr)

      // ---- number ----
      case "round" =>
        CV(round(c(0), args.lift(1).map(x => int(x, name, "precision").toInt).getOrElse(0)),
          a(0).cv.t)
      case "floor" =>
        CV(Vrl.floorNum(c(0), args.lift(1).map(x => int(x, name, "precision").toInt).getOrElse(0)), TFloat)
      case "ceil" =>
        CV(Vrl.ceilNum(c(0), args.lift(1).map(x => int(x, name, "precision").toInt).getOrElse(0)), TFloat)
      case "abs" => CV(abs(c(0)), a(0).cv.t)
      case "mod" => CV(try_mod(c(0), c(1)), a(0).cv.t)

      // ---- array / map ----
      case "push" => CV(array_append(c(0), c(1)), TArr)
      case "append" => CV(concat(c(0), c(1)), TArr)
      case "flatten" => a(0).cv.t match {
        case TArr => CV(flatten(c(0)), TArr)
        case _ => CV(c(0), a(0).cv.t)
      }
      case "unique" => CV(array_distinct(c(0)), TArr)
      case "includes" => CV(array_contains(c(0), c(1)), TBool)
      case "chunks" => CV(Vrl.chunks(c(0), int(a(1), name, "size").toInt), TArr)
      case "merge" => CV(map_concat(c(0), c(1)), TMap)
      case "keys" => CV(map_keys(c(0)), TArr)
      case "values" => CV(map_values(c(0)), TArr)
      case "get" =>
        // get(value, ["a","b"]) — path as literal array unsupported in
        // general; single-key form only. try_element_at, not element_at:
        // under ANSI mode element_at throws on a missing map key, but the
        // reference's get returns null (so `?? default` works).
        CV(try_element_at(c(0), c(1)), TAny)

      case "zip" => CV(arrays_zip(c(0), c(1)), TArr)
      case "reverse" => CV(org.apache.spark.sql.functions.reverse(c(0)), a(0).cv.t)
      case "object_from_array" => CV(Vrl.objectFromArray(c(0)), TMap)
      case "tally" => CV(Vrl.tally(c(0)), TMap)
      case "unflatten" => CV(parse_json(Vrl.unflattenJson(c(0))), TVariant)

      case "redact" =>
        val filters = named.get("filters").orElse(args.lift(1)).flatMap(_.literal) match {
          case Some(l: Seq[_]) => l.map(_.toString)
          case Some(s: String) => Seq(s)
          case _ => throw VrlCompileException(
            "redact: filters must be a literal array of patterns")
        }
        CV(Vrl.redact(c(0), filters), TStr)
      case "sieve" =>
        CV(Vrl.sieve(c(0), str(a(1), name, "permitted"),
          named.get("replace_single").flatMap(_.literal).map(_.toString).getOrElse(""),
          named.get("replace_repeated").flatMap(_.literal).map(_.toString).getOrElse("")), TStr)

      // assert/assert_eq: true when the invariant holds; null (= runtime
      // error under `!`, routed to dropped) when it does not — the
      // reference aborts the resolution in the same situation
      case "assert" => CV(when(c(0), lit(true)), TBool)
      // log(value, level:, rate_limit_secs:) — side-effect-only in the
      // reference (writes to vector's own log); as a statement in a
      // distributed plan it is a no-op returning null.
      case "log" => CV(lit(null).cast("string"), TStr)
      case "assert_eq" => CV(when(c(0) === c(1), lit(true)), TBool)

      // driver-environment probes: constant per job, like the reference's
      // per-process values (functions/get_hostname.cue, get_env_var.cue)
      case "get_hostname" =>
        CV(lit(try java.net.InetAddress.getLocalHost.getHostName
        catch { case _: Exception => "localhost" }), TStr)
      case "get_env_var" =>
        CV(lit(sys.env.getOrElse(str(a(0), name, "name"), null)), TStr)

      case "parse_etld" => CV(Vrl.parseEtldPlusOne(c(0)), TStr)
      case "parse_linux_authorization" => CV(Vrl.parseSyslog3164(c(0)), TAny)
      case "parse_influxdb" => CV(graft.codecs.Decode.influxLine(c(0)), TAny)
      case "community_id" =>
        val seed = named.get("seed").map(x => int(x, name, "seed").toInt).getOrElse(0)
        CV(Vrl.communityId(c(0), c(1), c(2).cast("int"), c(3).cast("int"),
          c(4).cast("int"), lit(seed)), TStr)

      case "encode_snappy" => CV(Vrl.encodeSnappy(c(0).cast("binary")), TAny)
      case "decode_snappy" => CV(Vrl.decodeSnappy(c(0)).cast("string"), TStr)
      case "encode_zstd" => CV(Vrl.encodeZstd(c(0).cast("binary")), TAny)
      case "decode_zstd" => CV(Vrl.decodeZstd(c(0)).cast("string"), TStr)
      case "encode_lz4" => CV(Vrl.encodeLz4(c(0).cast("binary")), TAny)
      case "decode_lz4" => CV(Vrl.decodeLz4(c(0)).cast("string"), TStr)

      // parse_proto / encode_proto: compact literal field spec
      // "no:type:name;..." (types varint|sint|double|fixed64|string|bytes)
      // standing in for the reference's descriptor-file argument
      case "parse_proto" =>
        val ps = protoSchema(str(a(1), name, "schema"))
        CV(graft.codecs.ProtobufCodec.decode(ps, c(0)), TObj(ps.sparkType))
      case "encode_proto" =>
        CV(graft.codecs.ProtobufCodec.encode(protoSchema(str(a(1), name, "schema")), c(0)), TAny)

      case "decode_mime_q" => CV(Vrl.decodeMimeQ(c(0)), TStr)
      case "parse_ruby_hash" => CV(Vrl.parseRubyHash(c(0)), TVariant)
      case "parse_bytes" => CV(Vrl.parseBytes(c(0)), TInt)
      case "encode_punycode" => CV(Vrl.encodePunycode(c(0)), TStr)
      case "decode_punycode" => CV(Vrl.decodePunycode(c(0)), TStr)

      // ---- syslog coercions ----
      case "to_syslog_level" => CV(Vrl.toSyslogLevel(c(0)), TStr)
      case "to_syslog_severity" => CV(Vrl.toSyslogSeverity(c(0)), TInt)
      case "to_syslog_facility" => CV(Vrl.toSyslogFacility(c(0)), TStr)

      // ---- ipv6 family ----
      case "ip_to_ipv6" => CV(Vrl.ipToIpv6(c(0)), TStr)
      case "ipv6_to_ipv4" => CV(Vrl.ipv6ToIpv4(c(0)), TStr)
      case "ip_pton" => CV(Vrl.ipPton(c(0)), TAny)
      case "ip_ntop" => CV(Vrl.ipNtop(c(0)), TStr)

      // ---- log-format parsers (round 5b) ----
      case "parse_klog" => CV(Vrl.parseKlog(c(0)), TAny)
      case "parse_aws_alb_log" => CV(Vrl.parseAwsAlbLog(c(0)), TAny)
      case "parse_aws_cloudwatch_log_subscription_message" =>
        CV(Vrl.parseCloudwatchSubscription(c(0)), TAny)
      case "parse_tokens" => CV(Vrl.parseTokens(c(0)), TArr)

      // ---- enumerate / match ----
      case "compact" => a(0).cv.t match {
        case TMap => CV(Vrl.compactMap(c(0)), TMap)
        case _ => CV(Vrl.compactArr(c(0)), TArr)
      }
      case "match_any" =>
        val pats = a(1).literal match {
          case Some(l: Seq[_]) => l.map(_.toString)
          case _ => throw VrlCompileException(
            "match_any: patterns must be a literal array")
        }
        CV(Vrl.matchAny(c(0), pats), TBool)
      case "match_array" =>
        val all = named.get("all").flatMap(_.literal).contains(true)
        CV(Vrl.matchArray(c(0), str(a(1), name, "pattern"), all), TBool)
      case "format_int" =>
        CV(Vrl.formatInt(c(0), int(a(1), name, "base").toInt), TStr)

      // ---- type predicates ----
      case "is_nullish" => CV(Vrl.isNullish(c(0)), TBool)
      case "is_ipv4" => CV(Vrl.isIpv4Str(c(0)), TBool)
      case "is_ipv6" => CV(Vrl.isIpv6Str(c(0)), TBool)
      case "is_json" => CV(try_parse_json(c(0)).isNotNull, TBool)
      case "is_string" => a(0).cv.t match {
        case TStr => CV(c(0).isNotNull, TBool)
        case TVariant => CV(schema_of_variant(c(0)) === "STRING", TBool)
        case _ => CV(lit(false), TBool)
      }
      case "is_integer" => a(0).cv.t match {
        case TInt => CV(c(0).isNotNull, TBool)
        case TVariant => CV(schema_of_variant(c(0)) === "BIGINT", TBool)
        case _ => CV(lit(false), TBool)
      }
      case "is_float" => a(0).cv.t match {
        case TFloat => CV(c(0).isNotNull, TBool)
        case TVariant => CV(schema_of_variant(c(0)).isin("DOUBLE", "DECIMAL"), TBool)
        case _ => CV(lit(false), TBool)
      }
      case "is_boolean" => a(0).cv.t match {
        case TBool => CV(c(0).isNotNull, TBool)
        case TVariant => CV(schema_of_variant(c(0)) === "BOOLEAN", TBool)
        case _ => CV(lit(false), TBool)
      }
      case "is_array" => a(0).cv.t match {
        case TArr => CV(c(0).isNotNull, TBool)
        case TVariant => CV(schema_of_variant(c(0)).startsWith("ARRAY"), TBool)
        case _ => CV(lit(false), TBool)
      }
      case "is_object" => a(0).cv.t match {
        case TMap | TObj(_) => CV(c(0).isNotNull, TBool)
        case TVariant => CV(schema_of_variant(c(0)).startsWith("OBJECT") ||
          schema_of_variant(c(0)).startsWith("STRUCT"), TBool)
        case _ => CV(lit(false), TBool)
      }
      case "is_timestamp" => a(0).cv.t match {
        case TTs => CV(c(0).isNotNull, TBool)
        case _ => CV(lit(false), TBool)
      }

      // ---- crypto ----
      case "encrypt" =>
        CV(Vrl.encryptAes(c(0).cast("binary"), c(1),
          c(2).cast("binary"),
          named.get("iv").map(_.cv.col).getOrElse(args.lift(3).map(_.cv.col)
            .getOrElse(lit(null))).cast("binary")), TAny)
      case "decrypt" =>
        CV(Vrl.decryptAes(c(0).cast("binary"), c(1),
          c(2).cast("binary"),
          named.get("iv").map(_.cv.col).getOrElse(args.lift(3).map(_.cv.col)
            .getOrElse(lit(null))).cast("binary")), TAny)

      // ---- system probes ----
      case "get_timezone" =>
        CV(lit(java.util.TimeZone.getDefault.getID), TStr)

      // ---- random / id (excluded from oracle programs) ----
      case "uuid_v4" => CV(expr("uuid()"), TStr)
      case "uuid_v7" => CV(Vrl.uuidV7(), TStr)
      case "uuid_from_friendly_id" => CV(Vrl.uuidFromFriendlyId(c(0)), TStr)
      case "random_float" => CV(rand(), TFloat)
      case "random_bool" => CV(rand() > 0.5, TBool)
      case "random_int" =>
        CV((rand() * (c(1) - c(0))).cast("long") + c(0), TInt)
      case "random_bytes" => CV(Vrl.randomBytes(c(0).cast("int")), TAny)

      // ---- round-6 long tail ----
      case "type_of" =>
        // VRL type names (type_of.cue): resolved statically from the
        // compile-time type tag; variants inspect the runtime schema
        val typed: Column = a(0).cv.t match {
          case TStr => lit("string")
          case TInt => lit("integer")
          case TFloat => lit("float")
          case TBool => lit("boolean")
          case TTs => lit("timestamp")
          case TArr => lit("array")
          case TMap | TObj(_) => lit("object")
          case TVariant =>
            val sv = schema_of_variant(c(0))
            when(sv === "STRING", "string")
              .when(sv === "BIGINT", "integer")
              .when(sv.startsWith("DOUBLE") || sv.startsWith("DECIMAL"), "float")
              .when(sv === "BOOLEAN", "boolean")
              .when(sv.startsWith("ARRAY"), "array")
              .when(sv.startsWith("OBJECT") || sv.startsWith("STRUCT"), "object")
              .otherwise("null")
          case TAny => lit("string")
        }
        CV(when(c(0).isNull, lit("null")).otherwise(typed), TStr)
      case "tally_value" =>
        CV(size(filter(c(0), x => x <=> c(1))).cast("long"), TInt)
      case "contains_all" =>
        CV(forall(c(1), s => c(0).contains(s)), TBool)
      // to_regex: VRL builds a runtime regex from a string; our patterns
      // are compile-time literals, so this is the identity on the text
      case "to_regex" => a(0).cv
      case "parse_regex_all" =>
        val pat = str(a(1), name, "pattern")
        val groups = java.util.regex.Pattern.compile(pat).matcher("").groupCount()
        val namedGs = "\\(\\?<([A-Za-z][A-Za-z0-9]*)>".r.findAllMatchIn(pat)
          .map(_.group(1)).toList
        val labels =
          if (namedGs.length == groups) namedGs
          else (1 to groups).map(i => s"g$i").toList
        // one struct per whole-pattern match; groups re-derived by
        // re-anchoring the pattern on the matched substring
        CV(transform(regexp_extract_all(c(0), lit(pat), lit(0)),
          m => RegexStruct(m, pat, labels)), TArr)
      // (match_datadog_query is compiled in VrlCompiler — it needs the
      // event field environment to bind facets)
      // set_semantic_meaning: compile-time schema annotation in the
      // reference (lib/vector-vrl/functions/src/set_semantic_meaning.rs);
      // statement-position no-op here
      case "set_semantic_meaning" => CV(lit(null).cast("string"), TStr)
      case "tag_types_externally" =>
        // top-level type tagging ({"string": v} etc.); nested values keep
        // their shape (documented subset of the recursive reference form)
        val tag = a(0).cv.t match {
          case TStr => "string"
          case TInt => "integer"
          case TFloat => "float"
          case TBool => "boolean"
          case TTs => "timestamp"
          case TArr => "array"
          case _ => "object"
        }
        CV(struct(c(0).as(tag)), TObj(org.apache.spark.sql.types.StructType(Nil)))
      case "reverse_dns" =>
        // per-row PTR lookups from executors are an anti-pattern at scale
        // (and batch plans must be deterministic): the Spark-first form is
        // an enrichment-table join; a literal `table:` map stands in for
        // the join surface here, no-table means unresolvable (null)
        named.get("table").flatMap(_.literal) match {
          case Some(m: Map[_, _]) =>
            val entries = m.toSeq.flatMap { case (k, v) =>
              Seq(lit(k.toString), lit(v.toString)) }
            CV(try_element_at(map(entries: _*), c(0)), TStr)
          case _ => CV(lit(null).cast("string"), TStr)
        }
      case "array" => a(0).cv.t match {
        case TArr | TVariant => a(0).cv
        case _ => CV(lit(null).cast("array<string>"), TArr)
      }
      case "object" => a(0).cv.t match {
        case TMap | TObj(_) | TVariant => a(0).cv
        case _ => CV(lit(null).cast("map<string,string>"), TMap)
      }
      case "parse_dnstap" =>
        CV(Vrl.parseDnstap(c(0).cast("binary")), TObj(Vrl.dnstapType))

      case other =>
        throw VrlCompileException(s"unknown function: $other")
    }
  }
}
