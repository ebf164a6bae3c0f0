package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType, TimestampType}

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
  import VrlCompiler.{CV, TAny, TArr, TVarArr, TBool, TFloat, TInt, TMap, TObj, TRegex, TStr, TTs, TVariant, VrlCompileException}

  final case class Arg(cv: CV, literal: Option[Any])

  private def str(a: Arg, fn: String, what: String): String = a.literal match {
    case Some(s: String) => s
    case _ => throw VrlCompileException(s"$fn: $what must be a string literal")
  }
  private def int(a: Arg, fn: String, what: String): Long = a.literal match {
    case Some(i: Long) => i
    case _ => throw VrlCompileException(s"$fn: $what must be an integer literal")
  }

  /** VRL argument binding: named args bind their parameter; remaining
    * positional args fill the still-unbound parameters in declaration
    * order (`replace("foo", pattern: "o", with: "bar", 1)` puts `1` on
    * `count`). `pos` excludes the value argument.
    */
  private def bind(params: Seq[String], pos: List[Arg],
                   named: Map[String, Arg]): Map[String, Arg] = {
    var rest = pos
    params.flatMap { p =>
      named.get(p) match {
        case Some(x) => Some(p -> x)
        case None => rest match {
          case h :: t => rest = t; Some(p -> h)
          case Nil => None
        }
      }
    }.toMap
  }

  /** Rust-regex named groups `(?P<name>…)`/`(?<name>…)` → plain groups +
    * positional labels. Stripping the names sidesteps java.util.regex's
    * no-underscore group-name restriction (`(?<bytes_in>…)` is valid in
    * the reference's regex crate, invalid in Java).
    */
  private def regexLabels(rawPat: String): (String, List[String]) = {
    val namedRe = "\\(\\?P?<([A-Za-z_][A-Za-z0-9_]*)>".r
    val names = namedRe.findAllMatchIn(rawPat).map(_.group(1)).toList
    val stripped = namedRe.replaceAllIn(rawPat, "(")
    val groups = java.util.regex.Pattern.compile(stripped).matcher("").groupCount()
    val labels =
      if (names.length == groups) names
      else (1 to groups).map(i => s"g$i").toList
    (stripped, labels)
  }

  /** chrono strftime → java.time pattern for the common specifiers
    * (VRL timestamps use strftime-style formats; Spark uses java.time).
    */
  private[graft] def strftimeToJava(fmt: String, forParse: Boolean = false): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt(i) == '%' && i + 1 < fmt.length) {
        fmt(i + 1) match {
          // chrono %+ = RFC 3339: formatting prints a fixed +00:00-style
          // offset; parsing accepts optional fractions and Z
          case '+' =>
            sb.append(
              if (forParse) "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS][.SS][.S]XXX"
              else "yyyy-MM-dd'T'HH:mm:ssxxx")
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
        // quote literal runs whole: per-letter quoting ('l''o''g') is
        // wrong — java.time reads the inner '' as an ESCAPED QUOTE, so
        // "log" would render as l'o'g
        val start = i
        while (i < fmt.length && !(fmt(i) == '%' && i + 1 < fmt.length))
          i += 1
        val run = fmt.substring(start, i)
        if (run.exists(c => c.isLetter || c == '\''))
          sb.append("'").append(run.replace("'", "''")).append("'")
        else sb.append(run)
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

  def apply(name: String, args0: List[Arg], named: Map[String, Arg]): CV = {
    // `f(value: x)` — the universal first parameter may arrive named
    val args = if (args0.isEmpty && named.contains("value"))
      List(named("value")) else args0
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
        case TArr | TVarArr | TMap | TObj(_) => CV(size(c(0)).cast("long"), TInt)
        case TVariant =>
          // dynamic value: array size, object key count, or string length
          CV(coalesce(
            array_size(c(0).try_cast(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.VariantType))),
            size(c(0).try_cast(org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.VariantType))),
            length(try_variant_get(c(0), "$", "string"))).cast("long"), TInt)
        case _ => CV(length(c(0)).cast("long"), TInt)
      }
      case "strlen" => CV(length(c(0)).cast("long"), TInt)
      case "split" =>
        val b = bind(Seq("pattern", "limit"), args.drop(1), named)
        val sepArg = b.getOrElse("pattern",
          throw VrlCompileException("split: pattern is required"))
        val sep = str(sepArg, name, "pattern")
        // a regex literal splits as a pattern; a plain string splits
        // literally (published split.cue distinguishes by argument type)
        val re = if (sepArg.cv.t == VrlCompiler.TRegex) sep
                 else java.util.regex.Pattern.quote(sep)
        val limit = b.get("limit").map(x => int(x, name, "limit").toInt)
          .getOrElse(-1)
        CV(split(c(0), re, limit), TArr)
      case "join" =>
        val sep = args.lift(1).orElse(named.get("separator"))
          .map(x => str(x, name, "separator")).getOrElse("")
        CV(array_join(c(0), sep), TStr)
      case "replace" =>
        val b = bind(Seq("pattern", "with", "count"), args.drop(1), named)
        val patArg = b.getOrElse("pattern",
          throw VrlCompileException("replace: pattern is required"))
        val pat = str(patArg, name, "pattern")
        val isRe = patArg.cv.t == VrlCompiler.TRegex
        val wth = str(b.getOrElse("with",
          throw VrlCompileException("replace: with is required")), name, "with")
        val count = b.get("count").map(x => int(x, name, "count").toInt)
          .getOrElse(-1)
        if (count >= 0) {
          // bounded replacement has no Column builtin; tiny regex loop
          val re = if (isRe) pat else java.util.regex.Pattern.quote(pat)
          val u = udf { (s: String) =>
            if (s == null) null
            else {
              val m = java.util.regex.Pattern.compile(re).matcher(s)
              val sb = new StringBuilder; var done = 0; var last = 0
              while (done < count && m.find()) {
                sb.append(s.substring(last, m.start())).append(wth)
                last = m.end(); done += 1
              }
              sb.append(s.substring(last)).toString
            }
          }
          CV(u(c(0)), TStr)
        } else if (isRe)
          CV(regexp_replace(c(0), pat, java.util.regex.Matcher.quoteReplacement(wth)), TStr)
        else
          CV(org.apache.spark.sql.functions.replace(c(0), lit(pat), lit(wth)), TStr)
      case "replace_regex" =>
        CV(regexp_replace(c(0), str(a(1), name, "pattern"), str(a(2), name, "with")), TStr)
      case "contains" | "starts_with" | "ends_with" =>
        val b = bind(Seq("substring", "case_sensitive"), args.drop(1), named)
        val sub = b.getOrElse("substring",
          throw VrlCompileException(s"$name: substring is required")).cv.col
        val ci = b.get("case_sensitive").flatMap(_.literal).contains(false)
        val (l0, s0) = if (ci) (lower(c(0)), lower(sub)) else (c(0), sub)
        name match {
          case "contains" => CV(l0.contains(s0), TBool)
          case "starts_with" => CV(l0.startsWith(s0), TBool)
          case _ => CV(l0.endsWith(s0), TBool)
        }
      case "slice" =>
        // negative offsets count from the end (slice.cue)
        val b = bind(Seq("start", "end"), args.drop(1), named)
        val start = int(b.getOrElse("start",
          throw VrlCompileException("slice: start is required")), name, "start").toInt
        val endOpt = b.get("end").map(x => int(x, name, "end").toInt)
        val len = length(c(0))
        val sCol = if (start < 0) greatest(len + start, lit(0))
                   else least(lit(start), len)
        val eCol = endOpt match {
          case Some(e) => if (e < 0) greatest(len + e, lit(0)) else least(lit(e), len)
          case None => len
        }
        CV(substring(c(0), sCol + 1, greatest(eCol - sCol, lit(0))), TStr)
      case "truncate" =>
        val b = bind(Seq("limit", "suffix"), args.drop(1), named)
        val limit = int(b.getOrElse("limit",
          throw VrlCompileException("truncate: limit is required")), name, "limit").toInt
        val suffix = b.get("suffix").flatMap(_.literal)
          .orElse(named.get("ellipsis").flatMap(_.literal)) match {
          case Some(s: String) => s
          case Some(true) => "..." // legacy ellipsis flag
          case _ => ""
        }
        CV(when(length(c(0)) > limit,
          concat(substring(c(0), 1, limit), lit(suffix))).otherwise(c(0)), TStr)
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
        // scale TRUNCATES (1234.567 @ scale 2 -> "1.234,56"); separators
        // swap via translate (format_number.cue)
        val b = bind(Seq("scale", "decimal_separator", "grouping_separator"),
          args.drop(1), named)
        val scale = b.get("scale").map(x => int(x, name, "scale").toInt).getOrElse(2)
        val dSep = b.get("decimal_separator").map(x => str(x, name, "decimal_separator")).getOrElse(".")
        val gSep = b.get("grouping_separator").map(x => str(x, name, "grouping_separator")).getOrElse(",")
        val factor = math.pow(10, scale)
        val truncated = floor(c(0).cast("double") * factor) / factor
        val formatted = format_number(truncated, scale)
        CV(if (dSep == "." && gSep == ",") formatted
           else translate(formatted, ",.", gSep + dSep), TStr)

      // ---- parse ----
      // try_parse_json: malformed input is a VRL runtime error (null
      // here), not a Spark job failure
      case "parse_json" => CV(try_parse_json(c(0)), TVariant)
      case "parse_key_value" =>
        val fs = named.get("field_delimiter").map(x => str(x, name, "field_delimiter")).getOrElse(" ")
        val kv = named.get("key_value_delimiter").map(x => str(x, name, "key_value_delimiter")).getOrElse("=")
        CV(Vrl.parseKeyValue(c(0), fs, kv), TMap)
      case "parse_logfmt" => CV(Vrl.parseKeyValue(c(0)), TMap)
      case "parse_syslog" =>
        // published field names/types: facility+severity keywords, real
        // timestamp, RFC 5424 first with 3164 fallback. The VT carries
        // the REAL struct schema so `??` unification can tell this
        // object apart from other parsers' shapes (coalesce.cue).
        CV(Vrl.parseSyslogNamed(c(0)), TObj(StructType(Seq(
          StructField("facility", StringType),
          StructField("severity", StringType),
          StructField("timestamp", TimestampType),
          StructField("hostname", StringType),
          StructField("appname", StringType),
          StructField("procid", LongType),
          StructField("msgid", StringType),
          StructField("version", LongType),
          StructField("message", StringType)))))
      case "parse_common_log" =>
        val fmt = args.lift(1).orElse(named.get("timestamp_format"))
          .map(x => str(x, name, "timestamp_format"))
          .getOrElse("%d/%b/%Y:%T %z")
        val p = Vrl.parseCommonLog(c(0))
        CV(p.withField("timestamp",
          to_timestamp(p.getField("timestamp"),
            strftimeToJava(fmt, forParse = true))),
          TObj(StructType(Seq(
            StructField("host", StringType),
            StructField("identity", StringType),
            StructField("user", StringType),
            StructField("timestamp", TimestampType),
            StructField("message", StringType),
            StructField("method", StringType),
            StructField("path", StringType),
            StructField("protocol", StringType),
            StructField("status", IntegerType),
            StructField("size", LongType)))))
      case "parse_apache_log" =>
        val fm = args.lift(1).map(x => str(x, name, "format")).getOrElse("common")
        if (fm == "error") CV(Vrl.parseApacheErrorLog(c(0)), TAny)
        else CV(Vrl.parseCommonLog(c(0)), TAny)
      case "parse_nginx_log" => CV(Vrl.parseNginxLog(c(0)), TAny)
      case "parse_glog" => CV(Vrl.parseGlog(c(0)), TAny)
      case "parse_user_agent" => CV(Vrl.parseUserAgent(c(0)), TAny)
      case "parse_query_string" => CV(Vrl.parseQueryString(c(0)), TMap)
      case "parse_url" =>
        // full published shape: scheme/username/password/host/port/path/
        // query(map)/fragment (parse_url.cue); username/password default
        // to "" as the reference does
        val userinfo = parse_url(c(0), lit("USERINFO"))
        val authority = parse_url(c(0), lit("AUTHORITY"))
        val query = parse_url(c(0), lit("QUERY"))
        CV(struct(
          lower(parse_url(c(0), lit("PROTOCOL"))).as("scheme"),
          coalesce(try_element_at(split(userinfo, ":", 2), lit(1)), lit(""))
            .as("username"),
          coalesce(try_element_at(split(userinfo, ":", 2), lit(2)), lit(""))
            .as("password"),
          parse_url(c(0), lit("HOST")).as("host"),
          regexp_extract(authority, ":(\\d+)$", 1).try_cast("long").as("port"),
          parse_url(c(0), lit("PATH")).as("path"),
          coalesce(str_to_map(query, lit("&"), lit("=")),
            map().cast("map<string,string>")).as("query"),
          parse_url(c(0), lit("REF")).as("fragment")), TObj(
          org.apache.spark.sql.types.StructType.fromDDL(
            "scheme STRING, username STRING, password STRING, host STRING, " +
              "port BIGINT, path STRING, query MAP<STRING,STRING>, " +
              "fragment STRING")))
      case "parse_duration" =>
        // result is expressed in `unit` (parse_duration.cue):
        // parse_duration("2s", "ms") -> 2000
        val unit = args.lift(1).orElse(named.get("unit"))
          .map(x => str(x, name, "unit")).getOrElse("s")
        val fac = unit match {
          case "ns" => 1e-9; case "us" | "µs" => 1e-6; case "ms" => 1e-3
          case "cs" => 1e-2; case "ds" => 1e-1; case "s" => 1.0
          case "m" => 60.0; case "h" => 3600.0; case "d" => 86400.0
          case other => throw VrlCompileException(s"parse_duration: unknown unit $other")
        }
        CV(Vrl.parseDurationSecs(c(0)) / fac, TFloat)
      case "parse_csv" => CV(Vrl.parseCsvArray(c(0)), TArr)
      case "encode_csv" => CV(Vrl.encodeCsvArray(c(0)), TStr)
      case "parse_cef" => CV(Vrl.parseCef(c(0)), TAny)
      case "parse_xml" =>
        val ddl = named.get("schema").map(x => str(x, name, "schema"))
          .getOrElse(throw VrlCompileException(
            "parse_xml: a literal `schema:` DDL argument is required"))
        CV(Vrl.parseXml(c(0), ddl), TAny)
      case "parse_aws_vpc_flow_log" =>
        args.lift(1).orElse(named.get("format"))
          .map(x => str(x, name, "format")) match {
          case Some(fmt) =>
            CV(Vrl.parseVpcFlowLogFormat(c(0), fmt.split("\\s+").toSeq), TAny)
          case None => CV(Vrl.parseVpcFlowLog(c(0)), TAny)
        }
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
        CV(to_timestamp(c(0),
          strftimeToJava(str(a(1), name, "format"), forParse = true)), TTs)
      case "parse_regex" =>
        val numeric = named.get("numeric_groups").flatMap(_.literal).contains(true)
        val (pat, labels) = regexLabels(str(a(1), name, "pattern"))
        // wrap in a group-0 capture when the full match is requested
        val (finalPat, finalLabels) =
          if (numeric) (s"($pat)", "0" :: labels) else (pat, labels)
        val st = org.apache.spark.sql.types.StructType(finalLabels.map(l =>
          org.apache.spark.sql.types.StructField(l,
            org.apache.spark.sql.types.StringType)))
        CV(RegexStruct(c(0), finalPat, finalLabels), TObj(st))

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
        // timestamps print RFC 3339 with a literal Z (to_string.cue;
        // remap_coercion asserts "2020-09-14T09:53:44Z")
        case TTs => CV(date_format(c(0), "yyyy-MM-dd'T'HH:mm:ss'Z'"), TStr)
        // null coerces to "" (to_string.cue), so an absent field is NOT
        // a runtime error under to_string!
        case _ => CV(coalesce(c(0).cast("string"), lit("")), TStr)
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
        val fmt = args.lift(1).orElse(named.get("format"))
          .map(x => str(x, name, "format")).getOrElse("%+")
        CV(date_format(c(0), strftimeToJava(fmt)), TStr)
      case "to_unix_timestamp" =>
        args.lift(1).orElse(named.get("unit")).flatMap(_.literal) match {
          case Some("milliseconds") => CV(unix_millis(c(0)), TInt)
          case Some("microseconds") => CV(unix_micros(c(0)), TInt)
          case Some("nanoseconds") => CV(unix_micros(c(0)) * 1000L, TInt)
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
        // published default variant is SHA-512/256 (sha2.cue) — no Spark
        // builtin, JDK MessageDigest covers it
        named.get("variant").flatMap(_.literal) match {
          case Some("SHA-224") => CV(sha2(c(0).cast("binary"), 224), TStr)
          case Some("SHA-256") => CV(sha2(c(0).cast("binary"), 256), TStr)
          case Some("SHA-384") => CV(sha2(c(0).cast("binary"), 384), TStr)
          case Some("SHA-512") => CV(sha2(c(0).cast("binary"), 512), TStr)
          case Some("SHA-512/224") => CV(Vrl.digestHex("SHA-512/224")(c(0)), TStr)
          case _ => CV(Vrl.digestHex("SHA-512/256")(c(0)), TStr)
        }
      case "sha3" =>
        // published default variant is SHA3-512 (sha3.cue)
        val variant = named.get("variant").flatMap(_.literal) match {
          case Some("SHA3-224") => "SHA3-224"
          case Some("SHA3-256") => "SHA3-256"
          case Some("SHA3-384") => "SHA3-384"
          case _ => "SHA3-512"
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
        val b = bind(Seq("cidr", "value"), args, named)
        CV(Vrl.ipCidrContains(str(b.getOrElse("cidr",
          throw VrlCompileException("ip_cidr_contains: cidr is required")),
          name, "cidr"),
          b.getOrElse("value", throw VrlCompileException(
            "ip_cidr_contains: value is required")).cv.col), TBool)
      case "ip_subnet" =>
        // subnet is `/prefix` or a netmask string (ip_subnet.cue)
        val sub = a(1).literal match {
          case Some(s: String) => s
          case Some(i: Long) => s"/$i"
          case _ => throw VrlCompileException(
            "ip_subnet: subnet must be a literal")
        }
        CV(Vrl.ipSubnetOf(c(0), sub), TStr)

      // ---- number ----
      case "round" | "floor" | "ceil" =>
        val prec = args.lift(1).orElse(named.get("precision"))
          .map(x => int(x, name, "precision").toInt).getOrElse(0)
        // precision 0 returns an integer (round.cue/floor.cue/ceil.cue)
        val v = name match {
          case "round" => round(c(0), prec)
          case "floor" => Vrl.floorNum(c(0), prec)
          case _ => Vrl.ceilNum(c(0), prec)
        }
        if (prec == 0) CV(v.cast("long"), TInt) else CV(v, TFloat)
      case "abs" => CV(abs(c(0)), a(0).cv.t)
      case "mod" => CV(try_mod(c(0), c(1)), a(0).cv.t)

      // ---- array / map ----
      case "push" => a(0).cv.t match {
        case TVariant => CV(concat(
          c(0).try_cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.VariantType)),
          array(c(1).cast(org.apache.spark.sql.types.VariantType))), TVarArr)
        case TVarArr => CV(array_append(c(0),
          c(1).cast(org.apache.spark.sql.types.VariantType)), TVarArr)
        case _ => CV(array_append(c(0), c(1)), TArr)
      }
      case "append" => (a(0).cv.t, a(1).cv.t) match {
        case (TVariant, _) | (_, TVariant) | (TVarArr, _) | (_, TVarArr) =>
          def va(x: CV): Column = x.t match {
            case TVariant => x.col.try_cast(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.VariantType))
            case TVarArr => x.col
            case _ => transform(x.col,
              e => e.cast(org.apache.spark.sql.types.VariantType))
          }
          CV(concat(va(a(0).cv), va(a(1).cv)), TVarArr)
        case _ => CV(concat(c(0), c(1)), TArr)
      }
      case "flatten" => a(0).cv.t match {
        case TArr => CV(flatten(c(0)), TArr)
        // recursive flatten over a dynamic value (objects flatten to
        // dotted keys, arrays flatten fully)
        case TVariant => CV(Vrl.flattenVariant(c(0)), TVariant)
        case _ => CV(c(0), a(0).cv.t)
      }
      case "unique" => CV(array_distinct(c(0)), TArr)
      case "includes" => CV(array_contains(c(0), c(1)), TBool)
      case "chunks" => CV(Vrl.chunks(c(0), int(a(1), name, "size").toInt), TArr)
      case "merge" => (a(0).cv.t, a(1).cv.t) match {
        case (TVariant, _) | (_, TVariant) =>
          val deep = named.get("deep").flatMap(_.literal).contains(true)
          CV(Vrl.mergeVariant(c(0), c(1), deep), TVariant)
        case _ => CV(map_concat(c(0), c(1)), TMap)
      }
      case "keys" => CV(map_keys(c(0)), TArr)
      case "values" => CV(map_values(c(0)), TArr)
      case "get" =>
        // get(value, ["a","b"]) — path as literal array unsupported in
        // general; single-key form only. try_element_at, not element_at:
        // under ANSI mode element_at throws on a missing map key, but the
        // reference's get returns null (so `?? default` works).
        CV(try_element_at(c(0), c(1)), TAny)
      // set/remove (functions/set.cue, remove.cue): external-value path
      // editing. Paths must be literal (same constant-parameter rule as
      // parse_regex patterns); maps take single-segment paths, structs
      // take dotted paths via Column.withField/dropFields.
      case "set" =>
        val path = a(1).literal match {
          case Some(l: Seq[_]) => l.map(_.toString)
          case Some(s: String) => Seq(s)
          case _ => throw VrlCompileException(
            "set: path must be a literal array of field names")
        }
        a(0).cv.t match {
          case TMap =>
            if (path.length != 1) throw VrlCompileException(
              "set: map values take a single-segment path")
            // pre-filter the key: map_concat raises on duplicates under
            // the default EXCEPTION dedup policy
            CV(map_concat(
              map_filter(c(0), (k, _) => k =!= lit(path.head)),
              map(lit(path.head), c(2))), TMap)
          case TObj(_) | TAny =>
            CV(c(0).withField(path.mkString("."), c(2)), TAny)
          case other => throw VrlCompileException(
            s"set: value must be an object, got $other")
        }
      case "remove" =>
        val path = a(1).literal match {
          case Some(l: Seq[_]) => l.map(_.toString)
          case Some(s: String) => Seq(s)
          case _ => throw VrlCompileException(
            "remove: path must be a literal array of field names")
        }
        a(0).cv.t match {
          case TMap =>
            if (path.length != 1) throw VrlCompileException(
              "remove: map values take a single-segment path")
            CV(map_filter(c(0), (k, _) => k =!= lit(path.head)), TMap)
          case TObj(_) | TAny =>
            CV(c(0).dropFields(path.mkString(".")), TAny)
          case other => throw VrlCompileException(
            s"remove: value must be an object, got $other")
        }

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
      case "to_syslog_facility_code" => CV(Vrl.toSyslogFacilityCode(c(0)), TInt)

      // ---- json schema ----
      case "validate_json_schema" =>
        val b = bind(Seq("schema_definition", "ignore_unknown_formats"),
          args.drop(1), named)
        val path = str(b.getOrElse("schema_definition",
          throw VrlCompileException(
            "validate_json_schema: schema_definition is required")),
          name, "schema_definition")
        val ignore = b.get("ignore_unknown_formats").flatMap(_.literal) match {
          case Some(x: Boolean) => x
          case Some(other) => throw VrlCompileException(
            s"validate_json_schema: ignore_unknown_formats must be a boolean literal, got $other")
          case None => false
        }
        // like the reference, the schema file is loaded when the program
        // compiles — a bad path is a compile-time error, not per-row
        val schemaJson = try new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(path)), "UTF-8")
          catch { case e: Exception => throw VrlCompileException(
            s"validate_json_schema: cannot read schema file $path: ${e.getMessage}") }
        try JsonLite.parse(schemaJson)
        catch { case e: Exception => throw VrlCompileException(
          s"validate_json_schema: schema file $path is not valid JSON: ${e.getMessage}") }
        CV(Vrl.validateJsonSchema(c(0).cast("string"), schemaJson, ignore), TBool)

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
        // recursive compact over a dynamic value (null / "" / empty
        // collections removed at every depth — compact.cue)
        case TVariant => CV(Vrl.compactVariant(c(0)), TVariant)
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
      case "is_json" => CV(JsonValidate(c(0)), TBool)
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
      // regexes are a compile-time type in this lowering (LitR -> TRegex),
      // so the predicate resolves statically like the reference's type checker
      case "is_regex" => a(0).cv.t match {
        case TRegex => CV(lit(true), TBool)
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
      case "get_timezone" | "get_timezone_name" =>
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
        val numeric = named.get("numeric_groups").flatMap(_.literal).contains(true)
        val (pat, labels) = regexLabels(str(a(1), name, "pattern"))
        val (finalPat, finalLabels) =
          if (numeric) (s"($pat)", "0" :: labels) else (pat, labels)
        // one struct per whole-pattern match; groups re-derived by
        // re-anchoring the pattern on the matched substring
        CV(transform(regexp_extract_all(c(0), lit(pat), lit(0)),
          m => RegexStruct(m, finalPat, finalLabels)), TArr)
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
        // the join surface here. Without a table, only the local
        // resolver-free cases resolve (loopback -> localhost) and the
        // published fallback applies: unresolvable returns the input.
        named.get("table").flatMap(_.literal) match {
          case Some(m: Map[_, _]) =>
            val entries = m.toSeq.flatMap { case (k, v) =>
              Seq(lit(k.toString), lit(v.toString)) }
            CV(try_element_at(map(entries: _*), c(0)), TStr)
          case _ => CV(
            when(c(0).isin("127.0.0.1", "::1", "0:0:0:0:0:0:0:1"),
              lit("localhost")).otherwise(c(0)), TStr)
        }
      case "dns_lookup" =>
        // same scale stance as reverse_dns: per-row resolver calls from
        // executors are nondeterministic and rate-limited, so the
        // Spark-first form is an enrichment-table join — a literal
        // `table:` map stands in for the resolver here. Returns the
        // published record shape (functions/dns_lookup.cue): answers
        // list + rcode pair, NXDOMAIN when the name is absent.
        val answers = named.get("table").flatMap(_.literal) match {
          case Some(m: Map[_, _]) =>
            val entries = m.toSeq.flatMap { case (k, v) =>
              Seq(lit(k.toString), lit(v.toString)) }
            val hit = try_element_at(map(entries: _*), c(0))
            when(hit.isNotNull, array(hit))
              .otherwise(array().cast("array<string>"))
          case _ => array().cast("array<string>")
        }
        CV(struct(
          answers.as("answers"),
          when(size(answers) > 0, lit(0)).otherwise(lit(3)).as("fullRcode"),
          when(size(answers) > 0, lit("NOERROR")).otherwise(lit("NXDOMAIN"))
            .as("rcodeName")),
          TObj(org.apache.spark.sql.types.StructType(Nil)))
      case "array" => a(0).cv.t match {
        case TArr | TVariant => a(0).cv
        case _ => CV(lit(null).cast("array<string>"), TArr)
      }
      case "object" => a(0).cv.t match {
        case TMap | TObj(_) | TVariant => a(0).cv
        // TAny may well BE object-shaped (struct-building parse_*
        // functions) — pass through and let the consumer resolve the
        // Catalyst type; statically-scalar values stay a type error
        case TAny => a(0).cv
        case _ => CV(lit(null).cast("map<string,string>"), TMap)
      }
      case "parse_dnstap" =>
        CV(Vrl.parseDnstap(c(0).cast("binary")), TObj(Vrl.dnstapType))

      case other =>
        throw VrlCompileException(s"unknown function: $other")
    }
  }
}
