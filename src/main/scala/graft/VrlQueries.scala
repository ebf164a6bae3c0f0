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
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))

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
      val parsed = Vrl.parseKeyValue(line)
      ev(s, dir).select(
        col("event_id"),
        element_at(parsed, "type").as("ptype"),
        element_at(parsed, "k").cast("long").as("pk"),
        element_at(parsed, "host").as("phost"))
        .orderBy(col("event_id"))
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
    }
  )

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

    "condition_datadog" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_type = 'error'
        |   OR (value > 150 AND NOT event_type = 'signup')
        |   OR event_type LIKE 'p%'
        |ORDER BY event_id""".stripMargin
  )
}
