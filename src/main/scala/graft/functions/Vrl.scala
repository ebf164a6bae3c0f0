package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The VRL stdlib surface as Catalyst `Column` functions.
  *
  * Reference: the remap expression language (external vrl crate 0.34,
  * /root/reference/Cargo.lock:13830-13832; function docs under
  * /root/reference/website/cue/reference/remap/functions.cue:33-56, 22
  * categories, ~190 functions). Functions with a direct Spark builtin are
  * thin aliases (codegen'd, zero custom code on the hot path); the
  * log-parsing family (syslog / logfmt / key-value / common-log / grok
  * subsets) is built from regexp + map primitives; only the compression
  * codecs fall back to JVM UDFs (non-hot-path by design).
  *
  * VRL's fallibility model (`??` error coalescing, abort) maps to
  * null-on-failure `try_`-style expressions + [[coalesced]]: a failed
  * parse yields null, which the caller coalesces or routes to the
  * `dropped` output (see operators.Remap.errorWhen).
  */
object Vrl {

  /** Single-evaluation let-binding: `f` references `x`'s VALUE through a
    * lambda variable instead of embedding a copy of `x`'s expression
    * tree per reference. Column-API struct builders like
    * `struct(parsed.getField("a"), parsed.getField("b"), ...)` otherwise
    * create one full copy of `parsed` PER FIELD — for an expensive
    * non-codegen parse (from_json is CodegenFallback, so whole-stage
    * subexpression elimination never dedupes it) that multiplies the
    * per-row parse cost by the field count (measured 6 parses/row in
    * parse_aws_cloudwatch_log_subscription_message, 4.4x the query
    * term). The one-element array wrap costs an allocation per row —
    * noise next to any real parse.
    */
  def bind(x: Column)(f: Column => Column): Column =
    element_at(transform(array(x), f), 1)

  // ---- String ----------------------------------------------------------
  def upcase(c: Column): Column = upper(c)
  def downcase(c: Column): Column = lower(c)
  def strTrim(c: Column): Column = trim(c)
  def splitStr(c: Column, sep: String): Column = split(c, sep)
  def joinArr(c: Column, sep: String): Column = array_join(c, sep)
  def replaceAll(c: Column, pat: String, rep: String): Column =
    regexp_replace(c, pat, rep)
  def slice(c: Column, start: Int, len: Int): Column = substring(c, start + 1, len)
  def containsStr(c: Column, s: String): Column = c.contains(s)
  def startsWith(c: Column, s: String): Column = c.startsWith(s)
  def endsWith(c: Column, s: String): Column = c.endsWith(s)
  def matches(c: Column, pattern: String): Column = c.rlike(pattern)
  def find(c: Column, pattern: String): Column = regexp_extract(c, pattern, 0)
  def truncate(c: Column, limit: Int, ellipsis: Boolean = false): Column =
    if (ellipsis) when(length(c) > limit, concat(substring(c, 1, limit), lit("...")))
      .otherwise(c)
    else substring(c, 1, limit)
  def stripWhitespace(c: Column): Column = trim(c)
  def stripAnsiEscapeCodes(c: Column): Column =
    regexp_replace(c, "\\u001B\\[[0-9;]*[A-Za-z]", "")
  def snakecase(c: Column): Column =
    lower(regexp_replace(regexp_replace(c, "([a-z0-9])([A-Z])", "$1_$2"), "[\\s-]+", "_"))
  /** Word list shared by the case-conversion family: camelCase boundaries
    * then split on underscore/space/dash. Public so callers computing
    * several case forms can materialize the words ONCE as a column.
    */
  def caseWords(c: Column): Column =
    filter(
      split(lower(regexp_replace(c, "([a-z0-9])([A-Z])", "$1_$2")), "[_\\s-]+"),
      w => length(w) > 0)
  def camelcaseOf(ws: Column): Column =
    concat(element_at(ws, 1),
      array_join(transform(
        org.apache.spark.sql.functions.slice(ws, 2, 1000000),
        w => initcap(w)), ""))
  def camelcase(c: Column): Column = camelcaseOf(caseWords(c))
  def pascalcaseOf(ws: Column): Column =
    array_join(transform(ws, w => initcap(w)), "")
  def pascalcase(c: Column): Column = pascalcaseOf(caseWords(c))
  def kebabcase(c: Column): Column = array_join(caseWords(c), "-")
  def screamingsnakecase(c: Column): Column = upper(array_join(caseWords(c), "_"))
  def strlen(c: Column): Column = length(c)
  /** format_number(n, places, grouping) — Spark builtin (same name). */
  def formatNumber(c: Column, places: Int): Column = format_number(c, places)
  def levenshteinDist(a: Column, b: Column): Column = levenshtein(a, b)

  // ---- Parse (the custom surface) --------------------------------------

  /** parse_key_value / parse_logfmt: `k=v k2="quoted v w spaces"` -> map.
    * Quote-aware: the field separator only splits outside double quotes
    * (lookahead for an even number of quotes to the right), matching the
    * reference's parse_key_value semantics.
    */
  def parseKeyValue(c: Column, fieldSep: String = " ", kvSep: String = "="): Column = {
    val fs = java.util.regex.Pattern.quote(fieldSep)
    val splitPat = fs + "(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)"
    // keys/values \s-trim (the published fn tolerates padded/multiline
    // input; Spark's trim() would strip spaces only)
    def wsTrim(x: Column): Column = regexp_replace(x, "^\\s+|\\s+$", "")
    map_filter(
      map_from_entries(
        transform(
          filter(split(c, splitPat), kv => kv.contains(kvSep)),
          kv => struct(
            wsTrim(substring_index(kv, kvSep, 1)).as("key"),
            regexp_replace(
              wsTrim(substr(kv,
                length(substring_index(kv, kvSep, 1)) + lit(kvSep.length + 1),
                length(kv))),
              "^\"|\"$", "").as("value")))),
      (k, _) => length(k) > 0)
  }

  /** parse_syslog, RFC3164 subset: `<PRI>TIMESTAMP HOST TAG[PID]: MSG`.
    * Returns a struct(priority, facility, severity, hostname, appname,
    * procid, message); null fields on non-match (VRL fallibility -> null).
    */
  def parseSyslog3164(c: Column): Column = {
    val pat = "^<(\\d{1,3})>(?:([A-Z][a-z]{2} [ 0-9]\\d \\d{2}:\\d{2}:\\d{2}) )?(\\S+) ([^\\[: ]+)(?:\\[(\\d+)\\])?: (.*)$"
    // ONE regex match per row (RegexStruct), vs 6 regexp_extract re-matches
    val g = RegexStruct(c, pat,
      Seq("pri", "timestamp", "hostname", "appname", "procid", "message"))
    val pri = g.getField("pri").cast("int")
    struct(
      pri.as("priority"),
      (pri / 8).cast("int").as("facility"),
      pmod(pri, lit(8)).cast("int").as("severity"),
      g.getField("timestamp").as("timestamp"),
      g.getField("hostname").as("hostname"),
      g.getField("appname").as("appname"),
      g.getField("procid").cast("long").as("procid"),
      coalesce(g.getField("message"), lit("")).as("message"))
  }

  /** parse_common_log (Apache CLF):
    * `host ident user [ts] "METHOD path PROTO" status size`.
    */
  def parseCommonLog(c: Column): Column = {
    val pat = "^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] \"(\\S+) (\\S+) (\\S+)\" (\\d{3}) (\\S+)$"
    val g = RegexStruct(c, pat,
      Seq("host", "ident", "user", "timestamp", "method", "path",
        "protocol", "status", "size"))
    // no match → null (a VRL runtime error), not an empty shell
    when(g.getField("host").isNotNull, struct(
      g.getField("host").as("host"),
      nullif(g.getField("ident"), lit("-")).as("identity"),
      g.getField("user").as("user"),
      g.getField("timestamp").as("timestamp"),
      concat_ws(" ", g.getField("method"), g.getField("path"),
        g.getField("protocol")).as("message"),
      g.getField("method").as("method"),
      g.getField("path").as("path"),
      g.getField("protocol").as("protocol"),
      g.getField("status").cast("int").as("status"),
      nullif(g.getField("size"), lit("-")).cast("long").as("size")))
  }

  /** parse_apache_log("error"): `[ts] [module:level] [pid N] [client ip] msg`. */
  def parseApacheErrorLog(c: Column): Column = {
    val pat = "^\\[([^\\]]+)\\] \\[(?:(\\w+):)?(\\w+)\\]" +
      "(?: \\[pid (\\d+)(?::tid (\\d+))?\\])?(?: \\[client ([^\\]]+)\\])? (.*)$"
    val g = RegexStruct(c, pat,
      Seq("timestamp", "module", "level", "pid", "tid", "client", "message"))
    struct(
      g.getField("timestamp").as("timestamp"),
      g.getField("module").as("module"),
      g.getField("level").as("level"),
      g.getField("pid").cast("long").as("pid"),
      g.getField("tid").cast("long").as("tid"),
      g.getField("client").as("client"),
      g.getField("message").as("message"))
  }

  /** parse_nginx_log("combined"): common log + referer + user agent. */
  def parseNginxLog(c: Column): Column = {
    val pat = "^(\\S+) - (\\S+) \\[([^\\]]+)\\] \"(\\S+) (\\S+) (\\S+)\" " +
      "(\\d{3}) (\\d+|-) \"([^\"]*)\" \"([^\"]*)\"$"
    val g = RegexStruct(c, pat, Seq("remote_addr", "remote_user", "timestamp",
      "method", "path", "protocol", "status", "size", "referer", "agent"))
    struct(
      g.getField("remote_addr").as("remote_addr"),
      nullif(g.getField("remote_user"), lit("-")).as("remote_user"),
      g.getField("timestamp").as("timestamp"),
      g.getField("method").as("method"),
      g.getField("path").as("path"),
      g.getField("protocol").as("protocol"),
      g.getField("status").cast("int").as("status"),
      nullif(g.getField("size"), lit("-")).cast("long").as("size"),
      nullif(g.getField("referer"), lit("-")).as("referer"),
      g.getField("agent").as("agent"))
  }

  /** parse_glog (google log / klog):
    * `I0929 12:00:00.123456 1234 file.cc:100] msg` — the date is MMDD
    * (classic) or YYYYMMDD (year-carrying variant the published fn
    * parses); `timestamp`/`id` are the VRL field names, `month`/`day`/
    * `thread_id` stay for schema continuity.
    */
  def parseGlog(c: Column): Column = {
    val pat = "^([IWEF])(?:(\\d{4}))?(\\d{2})(\\d{2}) (\\d{2}:\\d{2}:\\d{2})\\.(\\d+)" +
      "\\s+(\\d+) ([^:\\]]+):(\\d+)\\] (.*)$"
    val g = RegexStruct(c, pat, Seq("lvl", "year", "month", "day", "time",
      "usec", "thread_id", "file", "line", "message"))
    val level = g.getField("lvl")
    val yr = coalesce(g.getField("year"),
      date_format(current_timestamp(), "yyyy"))
    val ts = to_timestamp(concat(
      yr, lit("-"), g.getField("month"), lit("-"), g.getField("day"),
      lit(" "), g.getField("time"), lit("."), g.getField("usec")))
    struct(
      when(level === "I", "info").when(level === "W", "warning")
        .when(level === "E", "error").when(level === "F", "fatal")
        .as("level"),
      ts.as("timestamp"),
      g.getField("month").cast("int").as("month"),
      g.getField("day").cast("int").as("day"),
      g.getField("time").as("time"),
      g.getField("thread_id").cast("long").as("id"),
      g.getField("thread_id").cast("long").as("thread_id"),
      g.getField("file").as("file"),
      g.getField("line").cast("long").as("line"),
      g.getField("message").as("message"))
  }

  /** parse_aws_vpc_flow_log (default v2 format: 14 space-separated cols). */
  def parseVpcFlowLog(c: Column): Column = {
    val p = split(c, " ")
    def f(i: Int): Column = nullif(element_at(p, i), lit("-"))
    struct(
      f(1).cast("int").as("version"), f(2).as("account_id"),
      f(3).as("interface_id"), f(4).as("srcaddr"), f(5).as("dstaddr"),
      f(6).cast("int").as("srcport"), f(7).cast("int").as("dstport"),
      f(8).cast("int").as("protocol"), f(9).cast("long").as("packets"),
      f(10).cast("long").as("bytes"), f(11).cast("long").as("start"),
      f(12).cast("long").as("end"), f(13).as("action"), f(14).as("log_status"))
  }

  /** parse_aws_vpc_flow_log with a custom `format:` field list — each
    * name takes the published column's type (v5+ custom formats).
    */
  def parseVpcFlowLogFormat(c: Column, fields: Seq[String]): Column = {
    val intFields = Set("version", "srcport", "dstport", "protocol")
    val longFields = Set("packets", "bytes", "start", "end",
      "tcp_flags", "traffic_path")
    val p = split(c, " ")
    struct(fields.zipWithIndex.map { case (f, i) =>
      val raw = nullif(element_at(p, i + 1), lit("-"))
      val typed =
        if (intFields(f)) raw.cast("int")
        else if (longFields(f)) raw.cast("long")
        else raw
      typed.as(f)
    }: _*)
  }

  /** parse_tokens: split into tokens, treating "quoted" and [bracketed]
    * chunks as single tokens; the enclosing quotes/brackets are stripped
    * from the emitted token (reference tokenizer yields `some brackets`
    * for `[some brackets]`). Only a full enclosure is stripped — a quote
    * embedded mid-token survives.
    */
  def parseTokens(c: Column): Column =
    transform(
      regexp_extract_all(c, lit("\"[^\"]*\"|\\[[^\\]]*\\]|\\S+"), lit(0)),
      // a bare `-` token means "absent" in the published tokenizer
      t => nullif(regexp_replace(t, "^\"(.*)\"$|^\\[(.*)\\]$", "$1$2"), lit("-")))

  /** decode_mime_q (RFC 2047 encoded-words): `=?charset?Q|B?payload?=`
    * segments decoded in place (Q: `_`=space + =XX hex; B: base64).
    */
  val decodeMimeQ: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else {
        val re = "=\\?([^?]+)\\?([QqBb])\\?([^?]*)\\?=".r
        re.replaceAllIn(s, m => {
          try {
            val payload = m.group(3)
            val bytes =
              if (m.group(2).equalsIgnoreCase("B"))
                java.util.Base64.getDecoder.decode(payload)
              else {
                val out = new java.io.ByteArrayOutputStream()
                var i = 0
                while (i < payload.length) {
                  payload(i) match {
                    case '_' => out.write(' '); i += 1
                    case '=' if i + 2 < payload.length + 1 && i + 3 <= payload.length =>
                      out.write(Integer.parseInt(payload.substring(i + 1, i + 3), 16))
                      i += 3
                    case c => out.write(c.toInt); i += 1
                  }
                }
                out.toByteArray
              }
            java.util.regex.Matcher.quoteReplacement(
              new String(bytes, m.group(1)))
          } catch { case _: Exception => m.matched }
        })
      }
    }

  /** parse_ruby_hash: `{"key" => value}` hash-rocket syntax normalized
    * to JSON, then parsed to a variant (string-keyed subset of the
    * published fn — symbol keys are out of scope).
    */
  def parseRubyHash(c: Column): Column =
    parse_json(regexp_replace(c, "\\s*=>\\s*", ": "))

  /** uuid_v7: time-ordered UUID (48-bit unix ms + version/variant bits
    * + random), per the published UUIDv7 layout.
    */
  val uuidV7: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { () =>
      val ms = System.currentTimeMillis()
      val r = java.util.concurrent.ThreadLocalRandom.current()
      val hi = (ms << 16) | 0x7000L | (r.nextLong() & 0x0FFFL)
      val lo = (r.nextLong() & 0x3FFFFFFFFFFFFFFFL) | Long.MinValue
      new java.util.UUID(hi, lo).toString
    }
  uuidV7.asNondeterministic()

  /** parse_bytes("1.5 MiB", ...) → byte count (binary and SI units). */
  def parseBytes(c: Column): Column = {
    val g = RegexStruct(trim(c), "^([0-9.]+)\\s*([A-Za-z]*)$", Seq("n", "u"))
    val n = g.getField("n").cast("double")
    val factor = Seq(
      "b" -> 1L, "" -> 1L,
      "kib" -> (1L << 10), "mib" -> (1L << 20), "gib" -> (1L << 30),
      "tib" -> (1L << 40), "pib" -> (1L << 50),
      "kb" -> 1000L, "mb" -> 1000000L, "gb" -> 1000000000L,
      "tb" -> 1000000000000L).foldLeft(lit(null).cast("long")) {
      case (acc, (u, f)) => when(lower(g.getField("u")) === u, lit(f)).otherwise(acc)
    }
    (n * factor).cast("long")
  }

  /** parse_csv: one CSV record → array of fields (RFC 4180 quoting,
    * `""` escapes). Sequential by nature → UDF at the codec edge.
    */
  val parseCsvArray: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else {
        val out = scala.collection.mutable.ListBuffer[String]()
        val cur = new StringBuilder
        var i = 0
        var inQ = false
        while (i < s.length) {
          val ch = s(i)
          if (inQ) {
            if (ch == '"' && i + 1 < s.length && s(i + 1) == '"') { cur += '"'; i += 1 }
            else if (ch == '"') inQ = false
            else cur += ch
          } else ch match {
            case '"' => inQ = true
            case ',' => out += cur.toString; cur.clear()
            case c => cur += c
          }
          i += 1
        }
        out += cur.toString
        out.toSeq
      }
    }

  /** encode_csv: array of fields → one CSV record (quote when needed). */
  val encodeCsvArray: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (fields: Seq[String]) =>
      if (fields == null) null
      else fields.map { f =>
        val v = if (f == null) "" else f
        if (v.exists(c => c == ',' || c == '"' || c == '\n'))
          "\"" + v.replace("\"", "\"\"") + "\""
        else v
      }.mkString(",")
    }

  /** sha3 (SHA3-256/384/512 — in the JDK since 9). */
  def sha3Hex(variant: String): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else java.security.MessageDigest.getInstance(variant)
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }

  /** encode_punycode / decode_punycode (IDNA) via java.net.IDN. */
  val encodePunycode: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) => if (s == null) null else java.net.IDN.toASCII(s) }
  val decodePunycode: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) => if (s == null) null else java.net.IDN.toUnicode(s) }

  /** parse_user_agent (reference parse_user_agent; "fast" mode): browser
    * family, major version, and OS family from the UA string — the
    * practically-used regex subset, one RegexStruct pass per dimension.
    */
  def parseUserAgent(c: Column): Column = {
    // Real Edge/Opera UAs contain "Chrome/…" BEFORE "Edg/…"/"OPR/…", and
    // regex matching returns the earliest occurrence — so the derivative
    // tokens must outrank an earlier generic token. Cheapest measured
    // shape: ONE generic RegexStruct scan, plus codegen'd instr() probes
    // for the two derivative tokens, whose major version is cut with a
    // tiny anchored regex on a 10-char slice. (Measured at sf0.1: a
    // lazy-scan alternation regex 2.6×, an all-instr() least()-position
    // chain 1.7× — the when-tree there re-evaluates least() per branch —
    // and the original two RegexStruct passes 1.4× of this.)
    val g = userAgentTokens(c)
    parseUserAgentFrom(c, g)
  }

  /** The generic-token scan of [[parseUserAgent]], exposed separately so
    * callers can MATERIALIZE it (withColumn barrier) before the priority
    * logic: the family CASE references the struct in three conditional
    * branches, and codegen subexpression elimination does not span CASE
    * branches — un-materialized, the regex runs up to 3× per row.
    */
  def userAgentTokens(c: Column): Column =
    struct(
      RegexStruct(c,
        "(Firefox|Chrome|Safari|MSIE|Trident)[/ ]?(\\d+)?",
        Seq("family", "major")).as("g"),
      instr(c, "Edg/").as("edg"),
      instr(c, "OPR/").as("opr"))

  /** Priority/OS logic over a (possibly pre-materialized) token struct. */
  def parseUserAgentFrom(c: Column, t: Column): Column = {
    val g = t.getField("g")
    val edgPos = t.getField("edg")
    val oprPos = t.getField("opr")
    val derivPos = when(edgPos > 0, edgPos).when(oprPos > 0, oprPos)
    val derivMajor =
      regexp_extract(c.substr(derivPos + 4, lit(10)), "^[0-9]+", 0)
    val gFamily = nullif(g.getField("family"), lit(""))
    val family = when(edgPos > 0, "Edge").when(oprPos > 0, "Opera")
      .when(gFamily === "Trident", "MSIE").otherwise(gFamily)
    val major = nullif(
      when(derivPos.isNotNull, derivMajor).otherwise(g.getField("major")),
      lit(""))
    struct(
      family.as("browser_family"),
      major.cast("int").as("browser_major"),
      // containment priority: Android UAs also contain "Linux;"
      when(c.contains("Android"), "Android")
        .when(c.contains("iPhone") || c.contains("iPad"), "iOS")
        .when(c.contains("Windows NT"), "Windows")
        .when(c.contains("Mac OS X"), "Mac OS X")
        .when(c.contains("Linux"), "Linux")
        .as("os_family"))
  }

  /** parse_etld: effective top-level-domain+1 heuristic (common two-level
    * public suffixes, else the last two labels).
    */
  def parseEtldPlusOne(c: Column): Column = {
    val twoLevel = "(?:co|com|org|net|ac|gov|edu)\\.(?:uk|au|jp|nz|za|in|br)"
    coalesce(
      nullif(regexp_extract(c, "([^.]+\\." + twoLevel + ")$", 1), lit("")),
      nullif(regexp_extract(c, "([^.]+\\.[^.]+)$", 1), lit("")),
      c)
  }

  /** parse_cef (VRL stdlib; inverse of the lib/codecs cef encoder,
    * reference lib/codecs/src/encoding/format/cef.rs): header split on
    * unescaped pipes with `\|`/`\\` unescaping, then space-separated
    * `key=value` extensions whose values may contain spaces (`\=`
    * escapes an equals inside a value).
    */
  def parseCef(c: Column): Column = parseCefFrom(cefTokens(c))

  /** The header-field scan of [[parseCef]], exposed separately so callers
    * can MATERIALIZE it (withColumn barrier): the result struct extracts
    * 8 fields from it, and without the barrier the 6-group header regex
    * is inlined — and executed — once per extracted field.
    */
  def cefTokens(c: Column): Column =
    // hand-rolled single-pass scanner: exactly the semantics of the
    // previous 6-escaped-group regex `^CEF:(\d+)\|((?:\\.|[^|\\])*)\|…`
    // without its backtracking (A/B at sf0.1×40: 2.45 s -> 2.10 s on
    // the full cef encode+parse roundtrip, identical outputs)
    CefTokens(c)

  /** Field unescaping + extension map over a (possibly pre-materialized)
    * header-token struct.
    */
  def parseCefFrom(g: Column): Column = {
    def unesc(x: Column): Column = regexp_replace(x, "\\\\(.)", "$1")
    // a pair runs until the next `key=` boundary (values may hold
    // spaces). str_to_map with a lookahead pair delimiter + limit-2 kv
    // split stays in codegen — the previous regexp_extract_all +
    // per-pair extract/replace lambda form cost 3 interpreted regex
    // evaluations per pair
    // str_to_map maps every split segment unconditionally: an empty ext
    // would yield {"": null} and a malformed leading segment (no `key=`)
    // would become a garbage entry — filter both so only well-formed
    // `word=value` pairs survive (the previous extract-all behavior).
    val rawMap = map_filter(
      str_to_map(g.getField("ext"), lit("\\s+(?=\\w+=)"), lit("=")),
      (k, v) => k.rlike("^\\w+$") && v.isNotNull)
    val ext = transform_values(rawMap,
      (_, v) => regexp_replace(v, "\\\\(.)", "$1"))
    struct(
      g.getField("cef_version").cast("int").as("cef_version"),
      unesc(g.getField("device_vendor")).as("device_vendor"),
      unesc(g.getField("device_product")).as("device_product"),
      unesc(g.getField("device_version")).as("device_version"),
      unesc(g.getField("event_class_id")).as("event_class_id"),
      unesc(g.getField("name")).as("name"),
      g.getField("severity").as("severity"),
      ext.as("extensions"))
  }

  /** parse_xml — Spark-native from_xml against a DDL schema (VRL
    * parse_xml; text nodes/attributes map to the given struct fields).
    */
  def parseXml(c: Column, ddl: String): Column =
    from_xml(c, org.apache.spark.sql.types.StructType.fromDDL(ddl))

  // ---- Crypto: encrypt / decrypt (AES family) --------------------------

  /** encrypt/decrypt (VRL encrypt!/decrypt!; reference website/content/en/
    * highlights/2022-05-24-vrl-encryption.md): algorithm strings like
    * "AES-128-CBC-PKCS7", "AES-256-CTR", "AES-256-GCM"; caller supplies
    * key and iv bytes. Null on any bad algorithm/key/iv/ciphertext like
    * the rest of the fallible surface. JVM UDFs — sink-edge work, kept
    * off the codegen hot path deliberately.
    */
  // Cipher.getInstance does a provider scan — per-ROW it dominates the
  // actual crypto on short payloads, so instances are cached per thread
  // per transformation (Cipher is not thread-safe; init() per op is the
  // supported reuse pattern).
  private val cipherCache =
    ThreadLocal.withInitial[java.util.HashMap[String, javax.crypto.Cipher]](
      () => new java.util.HashMap[String, javax.crypto.Cipher]())
  private def aesDoFinal(mode: Int, algorithm: String, key: Array[Byte],
                         iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val parts = algorithm.split("-") // AES-<bits>-<MODE>[-PKCS7]
    if (parts.length < 3 || parts(0) != "AES") return null
    if (key == null || key.length != parts(1).toInt / 8) return null
    val padding =
      if (parts.length > 3 && parts(3) == "PKCS7") "PKCS5Padding"
      else "NoPadding"
    val transformation = s"AES/${parts(2)}/$padding"
    // GCM encryption refuses re-init with an unchanged key+iv (JCE
    // nonce-reuse guard) — that mode gets a fresh instance each call
    val cacheable =
      parts(2) != "GCM" || mode != javax.crypto.Cipher.ENCRYPT_MODE
    val cache = cipherCache.get()
    var cipher = if (cacheable) cache.get(transformation) else null
    if (cipher == null) {
      cipher = javax.crypto.Cipher.getInstance(transformation)
      if (cacheable) cache.put(transformation, cipher)
    }
    val ks = new javax.crypto.spec.SecretKeySpec(key, "AES")
    if (parts(2) == "GCM")
      cipher.init(mode, ks, new javax.crypto.spec.GCMParameterSpec(128, iv))
    else
      cipher.init(mode, ks, new javax.crypto.spec.IvParameterSpec(iv))
    cipher.doFinal(data)
  }
  val encryptAes: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (data: Array[Byte], algorithm: String,
           key: Array[Byte], iv: Array[Byte]) =>
      if (data == null || algorithm == null) null
      else try aesDoFinal(javax.crypto.Cipher.ENCRYPT_MODE, algorithm,
        key, iv, data)
      catch { case scala.util.control.NonFatal(_) => null }
    }
  val decryptAes: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (data: Array[Byte], algorithm: String,
           key: Array[Byte], iv: Array[Byte]) =>
      if (data == null || algorithm == null) null
      else try aesDoFinal(javax.crypto.Cipher.DECRYPT_MODE, algorithm,
        key, iv, data)
      catch { case scala.util.control.NonFatal(_) => null }
    }

  def parseJson(c: Column, schema: String): Column = from_json(c, lit(schema))
  def parseCsvLine(c: Column, schema: String): Column =
    from_csv(c, lit(schema), new java.util.HashMap[String, String]())
  def parseRegex(c: Column, pattern: String, group: Int): Column =
    nullif(regexp_extract(c, pattern, group), lit(""))
  def parseRegexAll(c: Column, pattern: String): Column =
    regexp_extract_all(c, lit(pattern))
  def parseUrlPart(c: Column, part: String): Column = parse_url(c, lit(part))
  def parseQueryString(c: Column): Column =
    map_from_entries(transform(split(c, "&"),
      kv => struct(substring_index(kv, "=", 1), substring_index(kv, "=", -1))))
  def parseInt(c: Column): Column = c.cast("long")
  def parseFloat(c: Column): Column = c.cast("double")
  /** parse_duration to seconds: "1h2m3s", "150ms", "1.5m". */
  def parseDurationSecs(c: Column): Column = {
    def part(unit: String, mult: Double): Column =
      coalesce(nullif(regexp_extract(c, s"([0-9.]+)$unit", 1), lit(""))
        .cast("double"), lit(0.0)) * mult
    part("h", 3600) + part("m(?![s])", 60) + part("(?<![m])s(?![a-z])", 1) +
      part("ms", 0.001) + part("us", 0.000001)
  }

  // ---- Codec -----------------------------------------------------------
  def encodeJson(c: Column): Column = to_json(c)
  def encodeBase64(c: Column): Column = base64(c.cast("binary"))
  def decodeBase64(c: Column): Column = unbase64(c).cast("string")
  def encodeHex(c: Column): Column = lower(hex(c.cast("binary")))
  def decodeHex(c: Column): Column = unhex(c).cast("string")
  def encodePercent(c: Column): Column = url_encode(c)
  def decodePercent(c: Column): Column = url_decode(c)
  /** encode_logfmt: struct/map -> `k=v` pairs joined by space. */
  def encodeLogfmt(m: Column): Column =
    array_join(
      transform(map_entries(m),
        e => concat(e.getField("key"), lit("="),
          when(e.getField("value").cast("string").rlike("[ =\"]"),
            concat(lit("\""), e.getField("value"), lit("\"")))
            .otherwise(e.getField("value").cast("string")))), " ")
  def encodeKeyValue(m: Column, fieldSep: String = " ", kvSep: String = "="): Column =
    array_join(transform(map_entries(m),
      e => concat(e.getField("key"), lit(kvSep), e.getField("value").cast("string"))),
      fieldSep)

  /** encode_gzip / decode_gzip — JVM deflater UDFs (no Spark builtin);
    * deliberately off the codegen hot path, used at sink edges only.
    */
  val encodeGzip: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(bytes); gz.close(); bos.toByteArray
      }
    }
  val decodeGzip: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      }
    }

  /** encode_zlib / decode_zlib (RFC1950 deflate stream). */
  val encodeZlib: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(bytes); d.finish()
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end(); out.toByteArray
      }
    }
  val decodeZlib: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val inf = new java.util.zip.Inflater()
        try {
          inf.setInput(bytes)
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var truncated = false
          while (!inf.finished() && !truncated) {
            val n = inf.inflate(buf)
            if (n == 0 && inf.needsInput()) truncated = true
            else out.write(buf, 0, n)
          }
          // decode_zlib! is fallible: a truncated stream errors in VRL
          // even if a valid prefix inflated — never return partial data
          if (truncated) null else out.toByteArray
        } catch {
          case _: java.util.zip.DataFormatException => null
        } finally inf.end()
      }
    }

  /** encode_snappy / decode_snappy (snappy-java, ships with Spark). */
  val encodeSnappy: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null else org.xerial.snappy.Snappy.compress(bytes)
    }
  val decodeSnappy: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null else org.xerial.snappy.Snappy.uncompress(bytes)
    }

  /** encode_zstd / decode_zstd (zstd-jni, ships with Spark). */
  val encodeZstd: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null else com.github.luben.zstd.Zstd.compress(bytes, 3)
    }
  val decodeZstd: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else com.github.luben.zstd.Zstd.decompress(bytes,
        com.github.luben.zstd.Zstd.getFrameContentSize(bytes).toInt)
    }

  // ---- Coerce / Type ---------------------------------------------------
  def toBool(c: Column): Column = c.cast("boolean")
  def toInt(c: Column): Column = c.cast("long")
  def toFloat(c: Column): Column = c.cast("double")
  def toStringCol(c: Column): Column = c.cast("string")
  def isNullVal(c: Column): Column = c.isNull
  def typeOf(c: Column): Column = typeof(c)

  // ---- Timestamp -------------------------------------------------------
  def nowTs(): Column = current_timestamp()
  def formatTimestamp(c: Column, fmt: String): Column = date_format(c, fmt)
  def parseTimestamp(c: Column, fmt: String): Column = to_timestamp(c, fmt)
  def toUnixTimestamp(c: Column): Column = unix_timestamp(c)
  def fromUnixTimestamp(c: Column): Column = timestamp_seconds(c)

  // ---- Number ----------------------------------------------------------
  def absNum(c: Column): Column = abs(c)
  def ceilNum(c: Column, precision: Int = 0): Column =
    ceil(c * math.pow(10, precision)) / math.pow(10, precision)
  def floorNum(c: Column, precision: Int = 0): Column =
    floor(c * math.pow(10, precision)) / math.pow(10, precision)
  def roundNum(c: Column, precision: Int = 0): Column = round(c, precision)
  def modNum(a: Column, b: Column): Column = pmod(a, b)

  // ---- Array -----------------------------------------------------------
  def push(arr: Column, v: Column): Column = array_append(arr, v)
  def append(a: Column, b: Column): Column = concat(a, b)
  def flattenArr(c: Column): Column = flatten(c)
  def uniqueArr(c: Column): Column = array_distinct(c)
  def chunks(c: Column, size: Int): Column =
    transform(sequence(lit(0), (org.apache.spark.sql.functions.size(c) - 1) / size),
      i => org.apache.spark.sql.functions.slice(c, i * size + 1, lit(size)))
  def includes(c: Column, v: Column): Column = array_contains(c, v)
  def sortArr(c: Column): Column = array_sort(c)
  def arrLength(c: Column): Column = org.apache.spark.sql.functions.size(c)
  def zip(a: Column, b: Column): Column = arrays_zip(a, b)
  // VRL closures (map/filter/for_each) are Spark higher-order functions:
  def mapArr(c: Column, f: Column => Column): Column = transform(c, f)
  def filterArr(c: Column, f: Column => Column): Column =
    org.apache.spark.sql.functions.filter(c, f)

  // ---- Object / Map ----------------------------------------------------
  def merge(a: Column, b: Column): Column = map_concat(a, b)
  def keys(m: Column): Column = map_keys(m)
  def values(m: Column): Column = map_values(m)
  def mapKeys(m: Column, f: Column => Column): Column = transform_keys(m, (k, _) => f(k))
  def mapValues(m: Column, f: Column => Column): Column =
    transform_values(m, (_, v) => f(v))
  def removeKey(m: Column, key: String): Column = map_filter(m, (k, _) => k =!= key)
  def getPath(m: Column, key: String): Column = element_at(m, key)
  // unnest -> explode at the DataFrame level (operators.Misc)

  // ---- IP --------------------------------------------------------------
  /** ip_aton: dotted-quad IPv4 -> long. */
  def ipAton(c: Column): Column = {
    val p = split(c, "\\.")
    element_at(p, 1).cast("long") * 16777216L +
      element_at(p, 2).cast("long") * 65536L +
      element_at(p, 3).cast("long") * 256L +
      element_at(p, 4).cast("long")
  }
  /** ip_ntoa: long -> dotted-quad IPv4. */
  def ipNtoa(c: Column): Column =
    concat_ws(".",
      (c / 16777216L).cast("long") % 256L,
      (c / 65536L).cast("long") % 256L,
      (c / 256L).cast("long") % 256L,
      c.cast("long") % 256L)
  /** ip_cidr_contains("10.1.0.0/16", ip) — IPv4 stays pure Column bit
    * math; IPv6 masks bytes driver-side against the literal CIDR.
    */
  def ipCidrContains(cidr: String, ip: Column): Column = {
    val Array(base, bits) = cidr.split("/")
    if (base.contains(":")) {
      val prefix = bits.toInt
      val baseBytes = java.net.InetAddress.getByName(base).getAddress
      val f = udf { (s: String) =>
        if (s == null) null.asInstanceOf[java.lang.Boolean]
        else try {
          val b = java.net.InetAddress.getByName(s).getAddress
          if (b.length != baseBytes.length) java.lang.Boolean.FALSE
          else {
            var ok = true
            var i = 0
            while (ok && i * 8 < prefix) {
              val rem = math.min(8, prefix - i * 8)
              val m = (0xff << (8 - rem)) & 0xff
              if ((b(i) & m) != (baseBytes(i) & m)) ok = false
              i += 1
            }
            java.lang.Boolean.valueOf(ok)
          }
        } catch { case _: Exception => java.lang.Boolean.FALSE }
      }
      f(ip)
    } else {
      val baseLong = base.split("\\.").map(_.toLong)
        .foldLeft(0L)((acc, o) => acc * 256 + o)
      val mask = if (bits.toInt == 0) 0L else (-1L << (32 - bits.toInt)) & 0xFFFFFFFFL
      (ipAton(ip).bitwiseAND(lit(mask))) === lit(baseLong & mask)
    }
  }
  /** ip_subnet: mask an IPv4 down to its /n network address. */
  def ipSubnet(ip: Column, prefixBits: Int): Column = {
    val mask = if (prefixBits == 0) 0L else (-1L << (32 - prefixBits)) & 0xFFFFFFFFL
    ipNtoa(ipAton(ip).bitwiseAND(lit(mask)))
  }

  // ---- Cryptography / Checksum / Random --------------------------------
  def md5Hex(c: Column): Column = md5(c.cast("binary"))
  def sha1Hex(c: Column): Column = sha1(c.cast("binary"))
  def sha2Hex(c: Column, bits: Int = 256): Column = sha2(c.cast("binary"), bits)
  def crc32Of(c: Column): Column = crc32(c.cast("binary"))
  def xxhash(c: Column*): Column = xxhash64(c: _*)
  def hmacSha256(key: String, c: Column): Column = {
    val f = udf { (msg: String) =>
      if (msg == null) null
      else {
        val mac = javax.crypto.Mac.getInstance("HmacSHA256")
        mac.init(new javax.crypto.spec.SecretKeySpec(
          key.getBytes("UTF-8"), "HmacSHA256"))
        mac.doFinal(msg.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
    }
    f(c)
  }
  def uuidV4(): Column = expr("uuid()")
  def randomFloat(): Column = rand()
  def randomInt(lo: Long, hi: Long): Column =
    (rand() * (hi - lo)).cast("long") + lo
  def randomBool(): Column = rand() > 0.5

  // ---- Fallibility (`??`, abort) --------------------------------------
  /** VRL `a ?? b`: null-on-error coalescing. */
  def coalesced(cs: Column*): Column = coalesce(cs: _*)

  // ---- Long-tail additions (round 5) ----------------------------------

  /** redact(value, filters) — replace every regex match with `[REDACTED]`
    * (reference functions/redact.cue; named filter `us_social_security_number`
    * supported alongside raw patterns).
    */
  def redact(c: Column, filters: Seq[String]): Column = {
    val patterns = filters.map {
      case "us_social_security_number" => "\\b\\d{3}-\\d{2}-\\d{4}\\b"
      case p => p
    }
    patterns.foldLeft(c)((acc, p) => regexp_replace(acc, p, "[REDACTED]"))
  }

  /** sieve(value, permitted) — keep only substrings matching the permitted
    * pattern; each run of disallowed characters collapses to
    * `replace_repeated` (default "") and a single disallowed character to
    * `replace_single` (reference functions/sieve.cue).
    */
  def sieve(c: Column, permitted: String, replaceSingle: String = "",
            replaceRepeated: String = ""): Column = {
    // single pass: replacement text must not be re-examined (a two-pass
    // regexp_replace would strip the just-inserted replacement when it
    // itself contains disallowed characters)
    // fast path: a plain character class negates directly — the generic
    // lookahead-per-character form costs ~10× on long documents
    val disallowed =
      if (permitted.matches("\\[[^\\[\\]]*\\]") && !permitted.startsWith("[^"))
        s"[^${permitted.substring(1, permitted.length - 1)}]+"
      else s"(?s)(?:(?!$permitted).)+"
    val pat = java.util.regex.Pattern.compile(disallowed)
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        val m = pat.matcher(s)
        val sb = new java.lang.StringBuilder
        var last = 0
        while (m.find()) {
          sb.append(s, last, m.start())
          sb.append(if (m.end() - m.start() > 1) replaceRepeated else replaceSingle)
          last = m.end()
        }
        sb.append(s, last, s.length).toString
      }
    }
    f(c)
  }

  /** unflatten({"a.b": v}) — dotted keys to nested objects, emitted as a
    * JSON string (callers `parse_json` it into a variant; reference
    * functions/unflatten.cue). Values are inserted as raw JSON when they
    * parse as JSON scalars, else as strings.
    */
  val unflattenJson: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (m: Map[String, String]) =>
      if (m == null) null
      else {
        // nested insert into a tree of sorted maps for deterministic order
        val root = new java.util.TreeMap[String, Object]()
        def insert(node: java.util.TreeMap[String, Object], path: List[String], v: String): Unit =
          path match {
            case key :: Nil => node.put(key, v)
            case key :: rest =>
              val child = node.get(key) match {
                case t: java.util.TreeMap[_, _] =>
                  t.asInstanceOf[java.util.TreeMap[String, Object]]
                case _ =>
                  val t = new java.util.TreeMap[String, Object]()
                  node.put(key, t); t
              }
              insert(child, rest, v)
            case Nil => ()
          }
        m.toSeq.sortBy(_._1).foreach { case (k, v) =>
          insert(root, k.split("\\.").toList, v)
        }
        def jsonOf(o: Object): String = o match {
          case t: java.util.TreeMap[_, _] =>
            val entries = t.asInstanceOf[java.util.TreeMap[String, Object]]
            import scala.jdk.CollectionConverters._
            entries.entrySet().asScala.map { e =>
              "\"" + e.getKey.replace("\\", "\\\\").replace("\"", "\\\"") +
                "\":" + jsonOf(e.getValue)
            }.mkString("{", ",", "}")
          case s: String =>
            // numbers / booleans / null pass through as JSON scalars
            if (s.matches("-?\\d+(\\.\\d+)?([eE][-+]?\\d+)?") || s == "true" ||
              s == "false" || s == "null") s
            else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          case _ => "null"
        }
        jsonOf(root)
      }
    }

  /** object_from_array([[k,v], ...]) — pairs to a map (reference
    * functions/object_from_array.cue). Spark-native: map_from_entries
    * expects struct pairs, so the 2-element-array form converts first.
    */
  def objectFromArray(pairs: Column): Column =
    map_from_entries(transform(pairs, p =>
      struct(element_at(p, 1).as("key"), element_at(p, 2).as("value"))))

  /** tally(array) — occurrence counts as a map (reference
    * functions/tally.cue). Single-pass UDF: the HOF form
    * (distinct × filter) is O(d×n) interpreted lambda evaluations per
    * row — measured 10× slower on document-sized token arrays. Keys
    * keep first-occurrence order for deterministic map output.
    */
  val tally: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (arr: Seq[String]) =>
      if (arr == null) null
      else {
        val m = scala.collection.mutable.LinkedHashMap[String, Long]()
        arr.foreach(v => m.update(v, m.getOrElse(v, 0L) + 1L))
        m
      }
    }

  /** community_id v1 (Corelight spec, reference functions/community_id.cue):
    * `1:` + base64(sha1(seed_be16 ‖ ip_lo ‖ ip_hi ‖ proto ‖ 0x00 ‖
    * port_lo_be16 ‖ port_hi_be16)) with (ip,port) endpoint ordering.
    * IPv4 only (the testdata universe); null on unparseable input.
    */
  val communityId: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (srcIp: String, dstIp: String, proto: Int, srcPort: Int, dstPort: Int, seed: Int) =>
      try {
        def ipBytes(s: String): Array[Byte] =
          s.split("\\.").map(o => (o.toInt & 0xFF).toByte)
        val (s, d) = {
          val sb = ipBytes(srcIp); val db = ipBytes(dstIp)
          val cmp = java.util.Arrays.compareUnsigned(sb, db)
          if (cmp < 0 || (cmp == 0 && srcPort <= dstPort))
            ((sb, srcPort), (db, dstPort))
          else ((db, dstPort), (sb, srcPort))
        }
        val buf = java.nio.ByteBuffer.allocate(2 + 4 + 4 + 2 + 2 + 2)
        buf.putShort(seed.toShort)
        buf.put(s._1); buf.put(d._1)
        buf.put(proto.toByte); buf.put(0.toByte)
        buf.putShort(s._2.toShort); buf.putShort(d._2.toShort)
        val sha = java.security.MessageDigest.getInstance("SHA-1").digest(buf.array())
        "1:" + java.util.Base64.getEncoder.encodeToString(sha)
      } catch { case _: Exception => null }
    }

  /** encode_lz4 / decode_lz4 — LZ4 block format with the uncompressed
    * size prepended little-endian (the reference's lz4_flex
    * `compress_prepend_size` layout; lz4-java ships with Spark).
    */
  val encodeLz4: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
        val out = comp.compress(bytes)
        java.nio.ByteBuffer.allocate(4 + out.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putInt(bytes.length).put(out).array()
      }
    }
  val decodeLz4: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.length < 4) null
      else try {
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val size = bb.getInt
        if (size < 0 || size > (1 << 30)) null
        else {
          val dec = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
          dec.decompress(bytes, 4, size)
        }
      } catch { case _: Exception => null }
    }

  // ---- Syslog level/facility coercions (to_syslog_*.cue) ---------------

  private val syslogLevels =
    Seq("emerg", "alert", "crit", "err", "warning", "notice", "info", "debug")

  /** to_syslog_level: RFC 5424 severity code -> keyword. */
  def toSyslogLevel(sev: Column): Column =
    element_at(array(syslogLevels.map(lit): _*), sev.cast("int") + 1)

  /** to_syslog_severity: keyword -> severity code (accepts the common
    * aliases panic/error/warn the published fn documents).
    */
  def toSyslogSeverity(level: Column): Column = {
    val aliased = when(level === "panic", "emerg")
      .when(level === "error", "err")
      .when(level === "warn", "warning")
      .otherwise(level)
    // fallible in the reference: unknown keyword is an error, which in
    // this framework's convention surfaces as null (routable to dropped)
    // — not a silent -1 passthrough
    (nullif(array_position(array(syslogLevels.map(lit): _*), aliased),
      lit(0L)) - 1).cast("long")
  }

  private val syslogFacilities = Seq(
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7")

  /** to_syslog_facility: facility code -> keyword. */
  def toSyslogFacility(code: Column): Column =
    element_at(array(syslogFacilities.map(lit): _*), code.cast("int") + 1)

  /** validate_json_schema(value, schema, ignore_unknown_formats):
    * true when the JSON payload validates; error (null) when it does not
    * or the payload is not JSON — the post-0.50 semantics where failure
    * is carried on the error channel. The schema text is parsed once at
    * compile time; the parsed tree rides the UDF closure (bounded —
    * schema files are small by construction).
    */
  def validateJsonSchema(c: Column, schemaJson: String,
                         ignoreUnknown: Boolean): Column = {
    val schema = JsonLite.parse(schemaJson)
    val f = udf { (s: String) =>
      if (s == null) null
      else try {
        val v = JsonLite.parse(s)
        if (JsonSchema.validate(schema, v, ignoreUnknown).isEmpty)
          java.lang.Boolean.TRUE
        else null
      } catch { case _: Exception => null }
    }
    f(c)
  }

  /** The validation-failure detail for the error channel:
    * `JSON schema validation failed: <err1>, <err2>` or null when valid.
    */
  def validateJsonSchemaErr(c: Column, schemaJson: String,
                            ignoreUnknown: Boolean): Column = {
    val schema = JsonLite.parse(schemaJson)
    val f = udf { (s: String) =>
      if (s == null) "value is null"
      else try {
        val errs = JsonSchema.validate(schema, JsonLite.parse(s), ignoreUnknown)
        if (errs.isEmpty) null
        else "JSON schema validation failed: " + errs.mkString(", ")
      } catch { case e: Exception => s"unable to parse json: ${e.getMessage}" }
    }
    f(c)
  }

  /** to_syslog_facility_code: keyword -> facility code (the inverse).
    * Unknown keyword is fallible in the reference -> null here.
    */
  def toSyslogFacilityCode(kw: Column): Column =
    (nullif(array_position(array(syslogFacilities.map(lit): _*), lower(kw)),
      lit(0L)) - 1).cast("long")

  // ---- IPv6 family (ip_to_ipv6.cue, ipv6_to_ipv4.cue, ip_pton/ntop) ----

  private def isIpv4(c: Column): Column =
    c.rlike("^(\\d{1,3}\\.){3}\\d{1,3}$")

  /** ip_to_ipv6: IPv4 -> its v4-mapped IPv6 form; IPv6 passes through. */
  def ipToIpv6(ip: Column): Column =
    when(isIpv4(ip), concat(lit("::ffff:"), ip)).otherwise(ip)

  /** ipv6_to_ipv4: v4-mapped IPv6 -> dotted quad; plain IPv4 passes
    * through; any other IPv6 is an error (null).
    */
  def ipv6ToIpv4(ip: Column): Column =
    when(isIpv4(ip), ip)
      .when(lower(ip).startsWith("::ffff:") &&
        isIpv4(regexp_replace(lower(ip), "^::ffff:", "")),
        regexp_replace(lower(ip), "^::ffff:", ""))
      .otherwise(lit(null).cast("string"))

  /** ip_pton: presentation -> network byte order (4 or 16 bytes).
    * Manual parse; never hits the resolver.
    */
  val ipPton: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else try {
        if (s.matches("^(\\d{1,3}\\.){3}\\d{1,3}$"))
          s.split("\\.").map(o => (o.toInt & 0xFF).toByte)
        else if (s.contains(":")) {
          // expand :: then parse 8 hextets big-endian
          val (head, tail) =
            if (s.contains("::")) {
              val p = s.split("::", -1)
              (p(0).split(":").filter(_.nonEmpty),
                p.lift(1).getOrElse("").split(":").filter(_.nonEmpty))
            } else (s.split(":"), Array.empty[String])
          val mid = Array.fill(8 - head.length - tail.length)("0")
          val hx = head ++ mid ++ tail
          if (hx.length != 8) null
          else {
            val bb = java.nio.ByteBuffer.allocate(16)
            hx.foreach(h => bb.putShort(Integer.parseInt(h, 16).toShort))
            bb.array()
          }
        } else null
      } catch { case _: Exception => null }
    }

  /** ip_ntop: 4/16-byte network form -> presentation (IPv6 in the
    * canonical lowercase uncompressed-hextet form the JDK emits).
    */
  val ipNtop: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (b: Array[Byte]) =>
      if (b == null || (b.length != 4 && b.length != 16)) null
      else try java.net.InetAddress.getByAddress(b).getHostAddress
      catch { case _: Exception => null }
    }

  // ---- Log-format parsers: klog, ALB, CloudWatch subscription ----------

  /** parse_klog: kubernetes klog header
    * `L MMDD HH:MM:SS.ffffff  <id> <file>:<line>] msg` (published fn:
    * fields file/id/level/line/message/timestamp; level letter
    * I/W/E/F -> info/warning/error/fatal; timestamp gets the current
    * year, UTC).
    */
  def klogTokens(c: Column): Column =
    RegexStruct(c,
      "^([IWEF])(\\d{2})(\\d{2}) (\\d{2}:\\d{2}:\\d{2}\\.\\d+)\\s+(\\d+) " +
        "([^ :]+):(\\d+)\\] (.*)$",
      Seq("lvl", "mm", "dd", "time", "id", "file", "line", "message"))

  def parseKlogFrom(g: Column): Column =
    struct(
      when(g.getField("lvl") === "I", "info")
        .when(g.getField("lvl") === "W", "warning")
        .when(g.getField("lvl") === "E", "error")
        .when(g.getField("lvl") === "F", "fatal").as("level"),
      to_timestamp(
        concat(date_format(current_timestamp(), "yyyy"), lit("-"),
          g.getField("mm"), lit("-"), g.getField("dd"), lit(" "),
          g.getField("time")),
        "yyyy-MM-dd HH:mm:ss.SSSSSS").as("timestamp"),
      g.getField("id").cast("long").as("id"),
      g.getField("file").as("file"),
      g.getField("line").cast("long").as("line"),
      g.getField("message").as("message"))

  def parseKlog(c: Column): Column = parseKlogFrom(klogTokens(c))

  /** parse_aws_alb_log: the ALB access-log line (published fn output
    * names; `request` is split into request_method/url/protocol; `-`
    * stands for absent on the nullable fields).
    */
  def albTokens(c: Column): Column =
    // hand-rolled single-pass scanner with exactly the semantics of the
    // previous 29-group regex (the pattern is kept verbatim in
    // AlbTokensSpec, which pins scanner == regex over well-formed AND
    // malformed lines); the regex was backtracking-free on this grammar
    // but paid 29-group matcher bookkeeping + a matcher allocation per
    // row
    AlbTokens(c)

  def parseAwsAlbLogFrom(g: Column): Column = {
    def nil(f: String): Column = nullif(g.getField(f), lit("-"))
    val req = split(g.getField("request"), " ")
    struct(
      g.getField("type").as("type"),
      g.getField("timestamp").as("timestamp"),
      g.getField("elb").as("elb"),
      g.getField("client_host").as("client_host"),
      nil("target_host").as("target_host"),
      g.getField("request_processing_time").cast("double")
        .as("request_processing_time"),
      g.getField("target_processing_time").cast("double")
        .as("target_processing_time"),
      g.getField("response_processing_time").cast("double")
        .as("response_processing_time"),
      g.getField("elb_status_code").cast("long").as("elb_status_code"),
      nil("target_status_code").cast("long").as("target_status_code"),
      g.getField("received_bytes").cast("long").as("received_bytes"),
      g.getField("sent_bytes").cast("long").as("sent_bytes"),
      element_at(req, 1).as("request_method"),
      element_at(req, 2).as("request_url"),
      element_at(req, 3).as("request_protocol"),
      nullif(g.getField("user_agent"), lit("-")).as("user_agent"),
      nil("ssl_cipher").as("ssl_cipher"),
      nil("ssl_protocol").as("ssl_protocol"),
      nil("target_group_arn").as("target_group_arn"),
      nullif(g.getField("trace_id"), lit("-")).as("trace_id"),
      nullif(g.getField("domain_name"), lit("-")).as("domain_name"),
      nullif(g.getField("chosen_cert_arn"), lit("-")).as("chosen_cert_arn"),
      nil("matched_rule_priority").cast("long").as("matched_rule_priority"),
      nil("request_creation_time").as("request_creation_time"),
      nullif(g.getField("actions_executed"), lit("-")).as("actions_executed"),
      nullif(g.getField("redirect_url"), lit("-")).as("redirect_url"),
      nullif(g.getField("error_reason"), lit("-")).as("error_reason"),
      nil("target_port_list").as("target_port_list"),
      nil("target_status_code_list").as("target_status_code_list"),
      nil("classification").as("classification"),
      nil("classification_reason").as("classification_reason"))
  }

  def parseAwsAlbLog(c: Column): Column = parseAwsAlbLogFrom(albTokens(c))

  /** parse_aws_cloudwatch_log_subscription_message: the fixed JSON
    * envelope CloudWatch Logs delivers to subscriptions (published fn:
    * owner/message_type/log_group/log_stream/subscription_filters/
    * log_events[{id,timestamp,message}]).
    */
  def parseCloudwatchSubscription(c: Column): Column = {
    val parsed = from_json(c, lit(
      "STRUCT<owner: STRING, messageType: STRING, logGroup: STRING, " +
        "logStream: STRING, subscriptionFilters: ARRAY<STRING>, " +
        "logEvents: ARRAY<STRUCT<id: STRING, timestamp: BIGINT, " +
        "message: STRING>>>"))
    bind(parsed)(p => struct(
      p.getField("owner").as("owner"),
      p.getField("messageType").as("message_type"),
      p.getField("logGroup").as("log_group"),
      p.getField("logStream").as("log_stream"),
      p.getField("subscriptionFilters").as("subscription_filters"),
      transform(p.getField("logEvents"), e => struct(
        e.getField("id").as("id"),
        timestamp_millis(e.getField("timestamp")).as("timestamp"),
        e.getField("message").as("message"))).as("log_events")))
  }

  // ---- Enumerate / match helpers ---------------------------------------

  /** compact(array): drop null and empty-string elements (shallow form
    * of the published recursive fn).
    */
  def compactArr(c: Column): Column =
    filter(c, x => x.isNotNull && x.cast("string") =!= "")

  /** compact(map): drop null-valued entries. */
  def compactMap(c: Column): Column =
    map_filter(c, (_, v) => v.isNotNull)

  /** match_any(value, patterns): true when any regex matches. */
  def matchAny(c: Column, patterns: Seq[String]): Column =
    patterns.map(c.rlike).reduce(_ || _)

  /** match_array(arr, pattern[, all]): any (or every) element matches. */
  def matchArray(arr: Column, pattern: String, all: Boolean = false): Column =
    if (all) forall(arr, _.rlike(pattern)) else exists(arr, _.rlike(pattern))

  /** format_int(n, base): reference emits lowercase digits, no prefix,
    * and a signed form for negatives (-255 -> "-ff") — whereas Spark
    * `conv` treats negative input as unsigned 64-bit, so the sign is
    * handled explicitly.
    */
  def formatInt(c: Column, base: Int): Column = {
    val mag = lower(conv(abs(c).cast("string"), 10, base))
    when(c < 0, concat(lit("-"), mag)).otherwise(mag)
  }

  /** is_nullish: null, empty, `-`, or whitespace-only (published
    * semantics in type-check fns).
    */
  def isNullish(c: Column): Column =
    // \s-trim, not trim(): Spark's trim strips ONLY 0x20, while the
    // published fn treats \t\r\n-only strings as nullish too
    c.isNull || c.cast("string").rlike("^[\\s]*$") ||
      c.cast("string") === "-"

  /** is_ipv4 / is_ipv6 (string-shape checks). One anchored regex whose
    * octet alternation encodes the <=255 range check — the previous
    * shape-regex + split + HOF `exists(cast)` ran interpreted (higher-
    * order functions are CodegenFallback) and re-scanned the string
    * three times. Octet semantics identical: 1-3 digits, numeric value
    * <= 255, leading zeros allowed ("099" == 99, as the int cast had it).
    */
  def isIpv4Str(c: Column): Column =
    c.rlike("^(\\d{1,2}|0\\d{2}|1\\d{2}|2[0-4]\\d|25[0-5])" +
      "(\\.(\\d{1,2}|0\\d{2}|1\\d{2}|2[0-4]\\d|25[0-5])){3}$")
  def isIpv6Str(c: Column): Column =
    c.contains(":") && c.rlike("^[0-9a-fA-F:.]+$")

  /** uuid_from_friendly_id: base62 -> the canonical 36-char UUID. */
  val uuidFromFriendlyId: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else try {
        val alphabet =
          "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        var acc = java.math.BigInteger.ZERO
        val base = java.math.BigInteger.valueOf(62)
        s.foreach { ch =>
          val d = alphabet.indexOf(ch)
          if (d < 0) throw new IllegalArgumentException
          acc = acc.multiply(base).add(java.math.BigInteger.valueOf(d))
        }
        val bytes = new Array[Byte](16)
        val raw = acc.toByteArray.dropWhile(_ == 0)
        if (raw.length > 16) throw new IllegalArgumentException
        System.arraycopy(raw, 0, bytes, 16 - raw.length, raw.length)
        val bb = java.nio.ByteBuffer.wrap(bytes)
        new java.util.UUID(bb.getLong, bb.getLong).toString
      } catch { case _: Exception => null }
    }

  /** random_bytes(n): excluded from oracle programs (nondeterministic). */
  val randomBytes: org.apache.spark.sql.expressions.UserDefinedFunction = {
    val f = udf { (n: Int) =>
      val b = new Array[Byte](n)
      java.util.concurrent.ThreadLocalRandom.current().nextBytes(b)
      b
    }
    f.asNondeterministic()
  }

  // ---- Long-tail additions (round 6) ----------------------------------

  /** haversine(lat1, lon1, lat2, lon2): great-circle distance + initial
    * bearing (published fn: returns {distance, bearing}; measurement
    * system "metric" = kilometers, "imperial" = miles). Pure Column math
    * — stays in whole-stage codegen.
    */
  def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                system: String = "metric"): Column = {
    val radiusKm = 6371.0
    val radius = if (system == "imperial") radiusKm * 0.621371 else radiusKm
    val phi1 = radians(lat1); val phi2 = radians(lat2)
    val dPhi = radians(lat2 - lat1); val dLam = radians(lon2 - lon1)
    val a = pow(sin(dPhi / 2), 2) + cos(phi1) * cos(phi2) * pow(sin(dLam / 2), 2)
    val dist = lit(2 * radius) * asin(sqrt(a))
    val y = sin(dLam) * cos(phi2)
    val x = cos(phi1) * sin(phi2) - sin(phi1) * cos(phi2) * cos(dLam)
    val bearing = pmod(degrees(atan2(y, x)) + 360.0, lit(360.0))
    struct(dist.as("distance"), bearing.as("bearing"))
  }

  /** shannon_entropy(text): base-2 entropy of the character distribution
    * (published fn; segmentation default = per character). Single-pass
    * JVM kernel — a Column formulation would need a per-row frequency
    * map through CodegenFallback HOFs anyway.
    */
  val shannonEntropy: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else {
        val counts = new java.util.HashMap[Int, Int]()
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          counts.merge(cp, 1, Integer.sum _)
          i += Character.charCount(cp)
        }
        val n = counts.values.asInstanceOf[java.util.Collection[Integer]]
        var total = 0L
        n.forEach(c => total += c.toLong)
        var h = 0.0
        if (total > 0) n.forEach { c =>
          val p = c.toDouble / total
          h -= p * (math.log(p) / math.log(2))
        }
        java.lang.Double.valueOf(h)
      }
    }

  /** decode_charset(bytes, from): bytes in `from` -> UTF-8 string;
    * encode_charset(string, to): UTF-8 string -> bytes in `to`
    * (published fns; JVM Charset registry covers the documented
    * encodings). Null on unknown charset like the rest of the fallible
    * surface.
    */
  val decodeCharset: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (b: Array[Byte], charset: String) =>
      if (b == null || charset == null) null
      else try new String(b, java.nio.charset.Charset.forName(charset))
      catch { case _: Exception => null }
    }
  val encodeCharset: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String, charset: String) =>
      if (s == null || charset == null) null
      else try s.getBytes(java.nio.charset.Charset.forName(charset))
      catch { case _: Exception => null }
    }

  // ---- CBOR (RFC 8949 subset) -----------------------------------------
  // parse_cbor / encode_cbor (published fns). Definite-length encoding of
  // the JSON-compatible subset: null/bool/int/float64/text/array/map.
  // The decoder emits a JSON string for parse_json, so CBOR payloads land
  // in the same variant pipeline as every other decoded format.

  private def cborWrite(out: java.io.ByteArrayOutputStream, major: Int,
                        value: Long): Unit = {
    val m = major << 5
    if (value < 24) out.write(m | value.toInt)
    else if (value < 256) { out.write(m | 24); out.write(value.toInt) }
    else if (value < 65536) {
      out.write(m | 25); out.write((value >> 8).toInt); out.write(value.toInt)
    } else if (value < (1L << 32)) {
      out.write(m | 26)
      var sh = 24
      while (sh >= 0) { out.write((value >> sh).toInt & 0xFF); sh -= 8 }
    } else {
      out.write(m | 27)
      var sh = 56
      while (sh >= 0) { out.write((value >> sh).toInt & 0xFF); sh -= 8 }
    }
  }

  private def cborEncodeValue(out: java.io.ByteArrayOutputStream,
                              v: Any): Unit = v match {
    case null => out.write(0xF6)
    case b: Boolean => out.write(if (b) 0xF5 else 0xF4)
    case i: Long => if (i >= 0) cborWrite(out, 0, i) else cborWrite(out, 1, -1 - i)
    case i: Int => cborEncodeValue(out, i.toLong)
    case d: Double =>
      out.write(0xFB)
      val bits = java.lang.Double.doubleToLongBits(d)
      var sh = 56
      while (sh >= 0) { out.write((bits >> sh).toInt & 0xFF); sh -= 8 }
    case d: java.math.BigDecimal =>
      if (d.scale() <= 0) cborEncodeValue(out, d.longValueExact())
      else cborEncodeValue(out, d.doubleValue())
    case s: String =>
      val b = s.getBytes("UTF-8"); cborWrite(out, 3, b.length); out.write(b)
    case a: java.util.List[_] =>
      cborWrite(out, 4, a.size)
      a.forEach(e => cborEncodeValue(out, e))
    case m: java.util.Map[_, _] =>
      cborWrite(out, 5, m.size)
      m.forEach((k, mv) => { cborEncodeValue(out, k); cborEncodeValue(out, mv) })
    case other => cborEncodeValue(out, other.toString)
  }

  /** JSON text -> CBOR bytes (driver for the roundtrip oracle: feeds
    * from to_json so arbitrary structs/maps encode without a UDT).
    */
  val encodeCborFromJson: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (json: String) =>
      if (json == null) null
      else try {
        val out = new java.io.ByteArrayOutputStream()
        cborEncodeValue(out, JsonLite.parse(json))
        out.toByteArray
      } catch { case _: Exception => null }
    }

  private final class CborReader(b: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = b(pos) & 0xFF; pos += 1; v }
    def uint(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (b(pos) & 0xFF); pos += 1; i += 1 }
      v
    }
    def head(ib: Int): Long = (ib & 0x1F) match {
      case 24 => uint(1); case 25 => uint(2); case 26 => uint(4)
      case 27 => uint(8)
      case v if v < 24 => v.toLong
      case _ => throw new IllegalArgumentException("indefinite length")
    }
    def value(): Any = {
      val ib = u8()
      (ib >> 5) match {
        case 0 => head(ib)
        case 1 => -1L - head(ib)
        case 2 => // byte string: JSON has no bytes type; base64 like encode_json
          val n = head(ib).toInt
          val r = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n
          java.util.Base64.getEncoder.encodeToString(r)
        case 3 =>
          val n = head(ib).toInt
          val s = new String(b, pos, n, "UTF-8"); pos += n; s
        case 4 =>
          val n = head(ib).toInt
          val out = new java.util.ArrayList[Any](n)
          (0 until n).foreach(_ => out.add(value()))
          out
        case 5 =>
          val n = head(ib).toInt
          val lm = new java.util.LinkedHashMap[String, Any]()
          (0 until n).foreach(_ => {
            val k = String.valueOf(value()); lm.put(k, value())
          })
          lm
        case 7 => (ib & 0x1F) match {
          case 20 => false
          case 21 => true
          case 22 | 23 => null
          case 25 => // half-precision
            val bits = uint(2).toInt
            val sign = if ((bits & 0x8000) != 0) -1.0 else 1.0
            val exp = (bits >> 10) & 0x1F; val frac = bits & 0x3FF
            if (exp == 0) sign * frac * math.pow(2, -24)
            else if (exp == 31) {
              if (frac == 0) sign * Double.PositiveInfinity else Double.NaN
            } else sign * (1 + frac / 1024.0) * math.pow(2, exp - 15)
          case 26 => java.lang.Float.intBitsToFloat(uint(4).toInt).toDouble
          case 27 => java.lang.Double.longBitsToDouble(uint(8))
          case other => throw new IllegalArgumentException(s"simple $other")
        }
        case other => throw new IllegalArgumentException(s"major $other")
      }
    }
  }

  /** CBOR bytes -> JSON text (feed to parse_json for the variant). */
  val decodeCborToJson: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (b: Array[Byte]) =>
      if (b == null) null
      else try JsonLite.render(new CborReader(b).value())
      catch { case _: Exception => null }
    }

  /** parse_cbor(bytes): CBOR -> variant. */
  def parseCbor(c: Column): Column = parse_json(decodeCborToJson(c))
  /** encode_cbor(value): struct/map/variant -> CBOR bytes. */
  def encodeCbor(c: Column): Column = encodeCborFromJson(to_json(c))

  // ---- dnstap ----------------------------------------------------------

  /** parse_dnstap output schema — the envelope subset of the reference's
    * output keys (src/sources/dnstap/mod.rs:358-396 test fixture shows
    * the published camelCase key set). `requestData` (the inner DNS wire
    * message parse) is out of scope: the reference delegates it to a
    * full DNS parser; the envelope fields below cover the dnstap frame
    * itself.
    */
  /** DNS message struct (requestData/responseData legs of parse_dnstap):
    * header flags + question + answers in presentation format, matching
    * the reference's trust-dns-derived output shape (src/sources/dnstap/
    * schema and the parse_dnstap docs). rData covers
    * A/AAAA/NS/CNAME/PTR/MX/TXT; other record types render as hex.
    */
  private val dnsMessageDDL: String =
    "STRUCT<header: STRUCT<id: BIGINT, opcode: BIGINT, rcode: BIGINT, " +
      "qr: BIGINT, aa: BOOLEAN, tc: BOOLEAN, rd: BOOLEAN, ra: BOOLEAN, " +
      "ad: BOOLEAN, cd: BOOLEAN, qdCount: BIGINT, anCount: BIGINT, " +
      "nsCount: BIGINT, arCount: BIGINT>, " +
      "question: ARRAY<STRUCT<domainName: STRING, class: STRING, " +
      "questionType: STRING, questionTypeId: BIGINT>>, " +
      "answers: ARRAY<STRUCT<domainName: STRING, class: STRING, " +
      "recordType: STRING, recordTypeId: BIGINT, ttl: BIGINT, " +
      "rData: STRING>>>"

  val dnstapType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "dataType STRING, dataTypeId BIGINT, messageType STRING, " +
        "messageTypeId BIGINT, serverId STRING, serverVersion STRING, " +
        "socketFamily STRING, socketProtocol STRING, " +
        "sourceAddress STRING, sourcePort BIGINT, " +
        "responseAddress STRING, responsePort BIGINT, " +
        "time BIGINT, timePrecision STRING, " +
        s"requestData $dnsMessageDDL, responseData $dnsMessageDDL")

  private val dnsTypeNames = Map(
    1 -> "A", 2 -> "NS", 5 -> "CNAME", 6 -> "SOA", 12 -> "PTR",
    15 -> "MX", 16 -> "TXT", 28 -> "AAAA", 33 -> "SRV", 255 -> "ANY")
  private val dnsClassNames = Map(1 -> "IN", 3 -> "CH", 4 -> "HS", 255 -> "ANY")

  /** RFC 1035 wire-format parse: header, question section, answer
    * section with compression-pointer following (4.1.4). Returns null on
    * malformed input (parse_dnstap is fallible in the reference).
    */
  private[functions] def parseDnsWire(b: Array[Byte]): org.apache.spark.sql.Row = {
    if (b == null || b.length < 12) return null
    import org.apache.spark.sql.Row
    try {
      def u8(i: Int): Int = b(i) & 0xff
      def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2)
      val flags = u16(2)
      val qd = u16(4); val an = u16(6); val nsc = u16(8); val arc = u16(10)
      // name decode; returns (name, offset after the name at the ORIGINAL
      // position) — pointer jumps don't advance the cursor (RFC 1035 4.1.4)
      def name(off0: Int): (String, Int) = {
        val sb = new StringBuilder
        var off = off0; var next = -1; var hops = 0
        while (hops < 128) {
          hops += 1
          val len = u8(off)
          if (len == 0)
            return (if (sb.isEmpty) "." else sb.toString,
              if (next >= 0) next else off + 1)
          else if ((len & 0xc0) == 0xc0) {
            if (next < 0) next = off + 2
            off = ((len & 0x3f) << 8) | u8(off + 1)
          } else {
            sb.append(new String(b, off + 1, len, "ASCII")).append('.')
            off += 1 + len
          }
        }
        throw new IllegalArgumentException("dns name loop")
      }
      def cleanName(n: String): String =
        if (n == ".") "." else n.stripSuffix(".")
      var pos = 12
      val question = (0 until qd).map { _ =>
        val (n, p) = name(pos)
        val qt = u16(p); val qc = u16(p + 2); pos = p + 4
        Row(cleanName(n), dnsClassNames.getOrElse(qc, qc.toString),
          dnsTypeNames.getOrElse(qt, qt.toString), qt.toLong)
      }
      def rdataStr(t: Int, off: Int, len: Int): String = t match {
        case 1 if len == 4 =>
          (0 until 4).map(i => u8(off + i)).mkString(".")
        case 28 if len == 16 =>
          java.net.InetAddress.getByAddress(
            java.util.Arrays.copyOfRange(b, off, off + 16)).getHostAddress
        case 2 | 5 | 12 => cleanName(name(off)._1)
        case 15 => s"${u16(off)} ${cleanName(name(off + 2)._1)}"
        case 16 =>
          // one or more character-strings, concatenated
          val sb = new StringBuilder; var o = off
          while (o < off + len) {
            val l = u8(o); sb.append(new String(b, o + 1, l, "UTF-8")); o += 1 + l
          }
          sb.toString
        case 33 =>
          s"${u16(off)} ${u16(off + 2)} ${u16(off + 4)} ${cleanName(name(off + 6)._1)}"
        case _ =>
          java.util.Arrays.copyOfRange(b, off, off + len)
            .map(x => f"${x & 0xff}%02x").mkString
      }
      val answers = (0 until an).map { _ =>
        val (n, p) = name(pos)
        val t = u16(p); val c = u16(p + 2); val ttl = u32(p + 4)
        val rdlen = u16(p + 8); val rdoff = p + 10
        pos = rdoff + rdlen
        Row(cleanName(n), dnsClassNames.getOrElse(c, c.toString),
          dnsTypeNames.getOrElse(t, t.toString), t.toLong, ttl,
          rdataStr(t, rdoff, rdlen))
      }
      Row(
        Row(u16(0).toLong, ((flags >> 11) & 0xf).toLong, (flags & 0xf).toLong,
          ((flags >> 15) & 1).toLong, ((flags >> 10) & 1) == 1,
          ((flags >> 9) & 1) == 1, ((flags >> 8) & 1) == 1,
          ((flags >> 7) & 1) == 1, ((flags >> 5) & 1) == 1,
          ((flags >> 4) & 1) == 1, qd.toLong, an.toLong, nsc.toLong,
          arc.toLong),
        question, answers)
    } catch { case _: Exception => null }
  }

  private val dnstapMessageTypes = Array(
    "AuthQuery", "AuthResponse", "ResolverQuery", "ResolverResponse",
    "ClientQuery", "ClientResponse", "ForwarderQuery", "ForwarderResponse",
    "StubQuery", "StubResponse", "ToolQuery", "ToolResponse",
    "UpdateQuery", "UpdateResponse")

  // dnstap.proto (public): Dnstap{identity=1 bytes, version=2 bytes,
  // message=14 Message, type=15 enum}; Message{type=1, socket_family=2,
  // socket_protocol=3, query_address=4, response_address=5, query_port=6,
  // response_port=7, query_time_sec=8, response_time_sec=12}
  private lazy val dnstapMessageSchema = {
    import graft.codecs.ProtobufCodec._
    ProtoSchema(Seq(
      ProtoField(1, "type", PVarint),
      ProtoField(2, "socket_family", PVarint),
      ProtoField(3, "socket_protocol", PVarint),
      ProtoField(4, "query_address", PBytes),
      ProtoField(5, "response_address", PBytes),
      ProtoField(6, "query_port", PVarint),
      ProtoField(7, "response_port", PVarint),
      ProtoField(8, "query_time_sec", PVarint),
      ProtoField(12, "response_time_sec", PVarint),
      // DNS wire-format payloads (dnstap.proto query_message=10,
      // response_message=14) — decoded by parseDnsWire
      ProtoField(10, "query_message", PBytes),
      ProtoField(14, "response_message", PBytes)))
  }
  private lazy val dnstapFrameSchema = {
    import graft.codecs.ProtobufCodec._
    ProtoSchema(Seq(
      ProtoField(1, "identity", PBytes),
      ProtoField(2, "version", PBytes),
      ProtoField(14, "message", PMessage(dnstapMessageSchema)),
      ProtoField(15, "type", PVarint)))
  }

  /** parse_dnstap(bytes): dnstap protobuf frame -> envelope struct (one
    * UDF pass: wire decode + enum naming + address formatting).
    */
  def parseDnstap(c: Column): Column = {
    val dec = new org.apache.spark.sql.api.java.UDF1[Array[Byte], org.apache.spark.sql.Row] {
      override def call(bytes: Array[Byte]): org.apache.spark.sql.Row = {
        if (bytes == null) return null
        try {
          val f = graft.codecs.ProtobufCodec.decodeTo(dnstapFrameSchema, bytes)
          def bstr(v: Any): String =
            if (v == null) null else new String(v.asInstanceOf[Array[Byte]], "UTF-8")
          val dataTypeId = f.get(3).asInstanceOf[java.lang.Long]
          val m = f.get(2).asInstanceOf[org.apache.spark.sql.Row]
          if (m == null) return null
          def ml(i: Int): java.lang.Long = m.get(i).asInstanceOf[java.lang.Long]
          def addr(i: Int): String = m.get(i) match {
            case null => null
            case b: Array[Byte] =>
              try java.net.InetAddress.getByAddress(b).getHostAddress
              catch { case _: Exception => null }
          }
          val mtId = ml(0)
          val mtName =
            if (mtId == null || mtId < 1 || mtId > 14) null
            else dnstapMessageTypes(mtId.toInt - 1)
          // queries carry odd type ids; their time/address live on the
          // query_* side, responses on the response_* side
          val isQuery = mtId != null && (mtId & 1L) == 1L
          val time = if (isQuery) ml(7) else ml(8)
          org.apache.spark.sql.Row(
            if (dataTypeId != null && dataTypeId == 1L) "Message" else null,
            dataTypeId, mtName, mtId,
            bstr(f.get(0)), bstr(f.get(1)),
            ml(1) match {
              case null => null
              case v => if (v == 1L) "INET" else if (v == 2L) "INET6" else null
            },
            ml(2) match {
              case null => null
              case v => if (v == 1L) "UDP" else if (v == 2L) "TCP" else null
            },
            addr(3), ml(5), addr(4), ml(6),
            time, if (time == null) null else "s",
            parseDnsWire(m.get(9).asInstanceOf[Array[Byte]]),
            parseDnsWire(m.get(10).asInstanceOf[Array[Byte]]))
        } catch { case _: Exception => null }
      }
    }
    udf(dec, dnstapType).apply(c)
  }

  // ---- VRL-named syslog / subnet / crypto / variant-JSON helpers ------

  /** parse_syslog with the published field names and types: facility and
    * severity as KEYWORDS, timestamp as a real timestamp, RFC 5424 with
    * an RFC 3164 fallback (functions/parse_syslog.cue). Kept separate
    * from [[parseSyslog3164]] (whose numeric facility/severity several
    * oracle queries pin).
    */
  def parseSyslogNamed(c: Column): Column = {
    val pat5424 = "^<(\\d{1,3})>(\\d+) (\\S+) (\\S+) (\\S+) (\\S+) (\\S+) " +
      "(?:-|\\[[^\\]]*\\](?:\\[[^\\]]*\\])*) (.*)$"
    val g5 = RegexStruct(c, pat5424, Seq("pri", "version", "timestamp",
      "hostname", "appname", "procid", "msgid", "message"))
    val g3 = parseSyslog3164(c)
    val pri = coalesce(g5.getField("pri").cast("int"),
      g3.getField("priority"))
    val tsPattern = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS][.SS][.S]XXX"
    // unparseable input is a VRL runtime ERROR (null here): neither the
    // 5424 nor the 3164 pattern matched → whole result null, so `??`
    // chains fall through (coalesce.cue) and `parse_syslog!` errors
    when(pri.isNotNull, struct(
      toSyslogFacility((pri / 8).cast("int")).as("facility"),
      toSyslogLevel(pmod(pri, lit(8))).as("severity"),
      coalesce(to_timestamp(g5.getField("timestamp"), tsPattern),
        to_timestamp(g3.getField("timestamp"), "MMM d HH:mm:ss"))
        .as("timestamp"),
      coalesce(g5.getField("hostname"), g3.getField("hostname"))
        .as("hostname"),
      coalesce(g5.getField("appname"), g3.getField("appname")).as("appname"),
      coalesce(nullif(g5.getField("procid"), lit("-")).try_cast("long"),
        g3.getField("procid")).as("procid"),
      nullif(g5.getField("msgid"), lit("-")).as("msgid"),
      g5.getField("version").cast("long").as("version"),
      coalesce(g5.getField("message"), g3.getField("message")).as("message")))
  }

  /** ip_subnet(ip, subnet): subnet is `/prefix` or a netmask string; the
    * masked network address comes back in canonical form (IPv6 zero-run
    * compressed, as the published fn prints).
    */
  def ipSubnetOf(ip: Column, subnet: String): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else try {
        val addr = java.net.InetAddress.getByName(s).getAddress
        val mask: Array[Byte] =
          if (subnet.startsWith("/")) {
            val bits = subnet.drop(1).toInt
            Array.tabulate(addr.length) { i =>
              val rem = math.min(8, math.max(0, bits - i * 8))
              ((0xff << (8 - rem)) & 0xff).toByte
            }
          } else java.net.InetAddress.getByName(subnet).getAddress
        if (mask.length != addr.length) null
        else {
          val out = addr.indices.map(i => (addr(i) & mask(i)).toByte).toArray
          val masked = java.net.InetAddress.getByAddress(out)
          if (out.length == 4) masked.getHostAddress
          else compressIpv6(masked.getHostAddress)
        }
      } catch { case _: Exception => null }
    }
    f(ip)
  }

  /** RFC 5952-style zero-run compression for an expanded IPv6 string. */
  private def compressIpv6(full: String): String = {
    val parts = full.split(":").map(p => Integer.parseInt(p, 16))
    // longest run of zero groups (>= 2) becomes ::
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i) == 0) {
        var j = i
        while (j < parts.length && parts(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) parts.map(_.toHexString).mkString(":")
    else {
      val head = parts.take(bestStart).map(_.toHexString).mkString(":")
      val tail = parts.drop(bestStart + bestLen).map(_.toHexString).mkString(":")
      s"$head::$tail"
    }
  }

  /** Generic MessageDigest hex (SHA-512/256 — VRL's sha2 default — has
    * no Spark builtin; JDK ships it since 9).
    */
  def digestHex(algo: String): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else java.security.MessageDigest.getInstance(algo)
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }

  // ---- variant JSON transforms (compact / flatten / deep merge) -------
  // The recursive published semantics have no fixed-depth Column form;
  // the variant value round-trips through its JSON text and a small
  // driver-written tree transform (tiny err-capture/behavior paths, not
  // the hot path — the typed TMap/TArr forms above stay pure Column).

  private def jlMap(v: Any): java.util.LinkedHashMap[String, Any] =
    v.asInstanceOf[java.util.LinkedHashMap[String, Any]]

  private def compactAny(v: Any): Any = v match {
    case m: java.util.LinkedHashMap[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      jlMap(m).forEach { (k, x) =>
        val c = compactAny(x)
        if (!isEmptyJson(c)) out.put(k, c)
      }
      out
    case l: java.util.ArrayList[_] =>
      val out = new java.util.ArrayList[Any]()
      l.forEach { x =>
        val c = compactAny(x)
        if (!isEmptyJson(c)) out.add(c)
      }
      out
    case other => other
  }
  private def isEmptyJson(v: Any): Boolean = v match {
    case null => true
    case s: String => s.isEmpty
    case l: java.util.ArrayList[_] => l.isEmpty
    case m: java.util.LinkedHashMap[_, _] => m.isEmpty
    case _ => false
  }

  private def flattenAny(v: Any): Any = v match {
    case m: java.util.LinkedHashMap[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      def walk(prefix: String, mm: java.util.LinkedHashMap[String, Any]): Unit =
        mm.forEach { (k, x) =>
          val key = if (prefix.isEmpty) k else s"$prefix.$k"
          x match {
            case child: java.util.LinkedHashMap[_, _] => walk(key, jlMap(child))
            case other => out.put(key, other)
          }
        }
      walk("", jlMap(m))
      out
    case l: java.util.ArrayList[_] =>
      val out = new java.util.ArrayList[Any]()
      def walk(ll: java.util.ArrayList[_]): Unit = ll.forEach {
        case child: java.util.ArrayList[_] => walk(child)
        case other => out.add(other)
      }
      walk(l)
      out
    case other => other
  }

  private def mergeAny(a: Any, b: Any, deep: Boolean): Any = (a, b) match {
    case (am: java.util.LinkedHashMap[_, _], bm: java.util.LinkedHashMap[_, _]) =>
      val out = new java.util.LinkedHashMap[String, Any](jlMap(am))
      jlMap(bm).forEach { (k, bv) =>
        if (deep && out.containsKey(k)) out.put(k, mergeAny(out.get(k), bv, deep))
        else out.put(k, bv)
      }
      out
    case (_, bv) => bv
  }

  private def jsonTransform(c: Column, f: Any => Any): Column = {
    val u = udf { (s: String) =>
      if (s == null) null
      else try JsonLite.render(f(JsonLite.parse(s)))
      catch { case _: Exception => null }
    }
    parse_json(u(to_json(c)))
  }

  def compactVariant(c: Column): Column = jsonTransform(c, compactAny)
  def flattenVariant(c: Column): Column = jsonTransform(c, flattenAny)
  /** Remove a top-level key from a dynamic (variant/map-shaped) event —
    * the `del(.f)` path when the event is a `. = <map>` root.
    */
  def variantRemoveKey(c: Column, key: String): Column = {
    val u = udf { (x: String) =>
      if (x == null) null
      else try {
        JsonLite.parse(x) match {
          case m: java.util.Map[_, _] =>
            val mm = new java.util.LinkedHashMap[String, Any](
              m.asInstanceOf[java.util.Map[String, Any]])
            mm.remove(key)
            JsonLite.render(mm)
          case _ => x
        }
      } catch { case _: Exception => null }
    }
    parse_json(u(to_json(c)))
  }

  def mergeVariant(a: Column, b: Column, deep: Boolean): Column = {
    val u = udf { (x: String, y: String) =>
      if (x == null || y == null) null
      else try JsonLite.render(mergeAny(JsonLite.parse(x), JsonLite.parse(y), deep))
      catch { case _: Exception => null }
    }
    parse_json(u(to_json(a), to_json(b)))
  }

  // ---- JSON parse diagnostics -----------------------------------------

  /** serde_json-compatible parse-error text for a JSON document, or null
    * when it parses. VRL's parse_json reports exactly this text inside
    * `function call error for "parse_json" …: unable to parse json: <m>`
    * (tests/behavior/transforms/remap.yaml remap_infallible_assignment
    * asserts `key must be a string at line 1 column 3`). Driver-side
    * literal probes and tiny err-capture paths only — not a hot path.
    */
  def jsonParseError(c: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) "expected value at line 1 column 1"
      else Option(jsonErrorOf(s)).map("unable to parse json: " + _).orNull)
    f(c)
  }

  /** Scan a JSON document, returning the first serde_json-style error
    * (message + 1-based line/column of the offending char) or null.
    */
  private[functions] def jsonErrorOf(s: String): String = {
    val n = s.length
    var i = 0
    var err: String = null
    // serde_json reports the count of consumed chars as the column
    // (1-based for an offending char, 0 for EOF-at-start)
    def pos(consumed: Int): String = {
      val upto = math.min(consumed, n)
      var line = 1; var nl = -1; var j = 0
      while (j < upto) { if (s(j) == '\n') { line += 1; nl = j }; j += 1 }
      s"at line $line column ${consumed - nl - 1}"
    }
    def fail(m: String, p: Int): Unit = if (err == null) err = s"$m ${pos(p)}"
    def ws(): Unit = while (i < n &&
      (s(i) == ' ' || s(i) == '\t' || s(i) == '\n' || s(i) == '\r')) i += 1
    def strLit(): Unit = {
      i += 1 // opening quote
      while (i < n && s(i) != '"') {
        if (s(i) == '\\') i += 2 else i += 1
      }
      if (i >= n) fail("EOF while parsing a string", n) else i += 1
    }
    def numLit(): Unit = {
      val start = i
      if (i < n && s(i) == '-') i += 1
      while (i < n && s(i).isDigit) i += 1
      if (i < n && s(i) == '.') { i += 1; while (i < n && s(i).isDigit) i += 1 }
      if (i < n && (s(i) == 'e' || s(i) == 'E')) {
        i += 1
        if (i < n && (s(i) == '+' || s(i) == '-')) i += 1
        while (i < n && s(i).isDigit) i += 1
      }
      if (i == start || s.substring(start, i).matches("-")) fail("invalid number", i + 1)
    }
    def keyword(k: String): Unit =
      if (i + k.length <= n && s.substring(i, i + k.length) == k) i += k.length
      else fail("expected value", i + 1)
    def objLit(): Unit = {
      i += 1
      ws()
      if (i >= n) { fail("EOF while parsing an object", n); return }
      if (s(i) == '}') { i += 1; return }
      var more = true
      while (more && err == null) {
        ws()
        if (i >= n) { fail("EOF while parsing an object", n); return }
        if (s(i) != '"') { fail("key must be a string", i + 1); return }
        strLit()
        ws()
        if (i >= n || s(i) != ':') { fail("expected `:`", i + 1); return }
        i += 1
        value()
        ws()
        if (i >= n) { fail("EOF while parsing an object", n); return }
        if (s(i) == ',') i += 1
        else if (s(i) == '}') { i += 1; more = false }
        else fail("expected `,` or `}`", i + 1)
      }
    }
    def arrLit(): Unit = {
      i += 1
      ws()
      if (i >= n) { fail("EOF while parsing a list", n); return }
      if (s(i) == ']') { i += 1; return }
      var more = true
      while (more && err == null) {
        value()
        ws()
        if (i >= n) { fail("EOF while parsing a list", n); return }
        if (s(i) == ',') i += 1
        else if (s(i) == ']') { i += 1; more = false }
        else fail("expected `,` or `]`", i + 1)
      }
    }
    def value(): Unit = {
      if (err != null) return
      ws()
      if (i >= n) { fail("EOF while parsing a value", n); return }
      s(i) match {
        case '{' => objLit()
        case '[' => arrLit()
        case '"' => strLit()
        case 't' => keyword("true")
        case 'f' => keyword("false")
        case 'n' => keyword("null")
        case ch if ch == '-' || ch.isDigit => numLit()
        case _ => fail("expected value", i + 1)
      }
    }
    value()
    if (err == null) { ws(); if (i < n) fail("trailing characters", i + 1) }
    err
  }
}
