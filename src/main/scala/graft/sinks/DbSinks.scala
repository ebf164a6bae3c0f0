package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import NetworkSinks.HttpConfig

/** Database sinks over their public load protocols:
  *
  *  - `postgres` (src/sinks/postgres/) — the PostgreSQL v3 wire
  *    protocol (codecs/Pg.scala), with the reference's EXACT insert
  *    statement: `INSERT INTO {table} SELECT * FROM
  *    jsonb_populate_recordset(NULL::{table}, $events)` per batch
  *    (service.rs:155), the jsonb array inlined as a quoted literal
  *    since the simple-query protocol has no binds.
  *  - `doris` (src/sinks/doris/) — Stream Load: PUT
  *    `/api/{db}/{table}/_stream_load` with basic auth, a unique label
  *    per request, json + read_json_by_line headers, ndjson body.
  *  - `databend` (src/sinks/databend/) — the streaming-load HTTP API:
  *    PUT `/v1/streaming_load` with an `insert_sql` header
  *    (`INSERT INTO table FORMAT NDJSON`) and ndjson body.
  *  - `greptimedb_logs` (src/sinks/greptimedb/) — POST
  *    `/v1/events/logs?db=&table=` with a JSON array body.
  *
  * Each task writes its own partition over its own connection.
  */
object DbSinks {

  private def eventJson(df: DataFrame) =
    to_json(struct(df.columns.filterNot(_.startsWith("__"))
      .map(col).toSeq: _*))

  // ---- postgres ----

  case class PostgresConfig(
      endpoint: String, // postgres://user@host:port/db
      table: String,
      maxEvents: Int = 1000)
      extends Serializable

  def writePostgres(df: DataFrame, cfg: PostgresConfig): Unit = {
    val c = cfg
    df.select(eventJson(df).as("__line")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        import graft.codecs.Pg
        val conn = Pg.connect(c.endpoint)
        try rows.grouped(c.maxEvents).foreach { batch =>
          val jsonArray = batch.flatMap(r => Option(r.getString(0)))
            .mkString("[", ",", "]")
          // service.rs:155 — the same statement, literal-inlined
          conn.query(s"INSERT INTO ${c.table} SELECT * FROM " +
            s"jsonb_populate_recordset(NULL::${c.table}, " +
            s"${Pg.quoteLiteral(jsonArray)})")
        } finally conn.close()
    }
  }

  // ---- doris ----

  case class DorisConfig(
      endpoint: String, database: String, table: String,
      user: String = "root", password: String = "",
      labelPrefix: String = "vector",
      maxEvents: Int = 10000)
      extends Serializable

  def writeDoris(df: DataFrame, cfg: DorisConfig): Unit = {
    val c = cfg
    df.select(eventJson(df).as("__line")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val basic = java.util.Base64.getEncoder.encodeToString(
          s"${c.user}:${c.password}".getBytes("UTF-8"))
        var seq = 0
        rows.grouped(c.maxEvents).foreach { batch =>
          seq += 1
          // label_prefix_db_table_uniquifier (config.rs:45)
          val label = s"${c.labelPrefix}_${c.database}_${c.table}_" +
            s"${java.util.UUID.randomUUID()}_$seq"
          val body = batch.flatMap(r => Option(r.getString(0)))
            .mkString("", "\n", "\n").getBytes("UTF-8")
          NetworkSinks.post(HttpConfig(
            uri = c.endpoint.stripSuffix("/") +
              s"/api/${c.database}/${c.table}/_stream_load",
            method = "put",
            contentType = "application/json",
            headers = Map("Authorization" -> s"Basic $basic",
              "label" -> label, "format" -> "json",
              "read_json_by_line" -> "true", "Expect" -> "100-continue")),
            body)
        }
    }
  }

  // ---- databend ----

  case class DatabendConfig(
      endpoint: String, database: String = "default", table: String,
      user: String = "root", password: String = "",
      maxEvents: Int = 10000)
      extends Serializable

  def writeDatabend(df: DataFrame, cfg: DatabendConfig): Unit = {
    val c = cfg
    df.select(eventJson(df).as("__line")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val basic = java.util.Base64.getEncoder.encodeToString(
          s"${c.user}:${c.password}".getBytes("UTF-8"))
        rows.grouped(c.maxEvents).foreach { batch =>
          val body = batch.flatMap(r => Option(r.getString(0)))
            .mkString("", "\n", "\n").getBytes("UTF-8")
          NetworkSinks.post(HttpConfig(
            uri = c.endpoint.stripSuffix("/") + "/v1/streaming_load",
            method = "put",
            contentType = "application/x-ndjson",
            headers = Map("Authorization" -> s"Basic $basic",
              "insert_sql" ->
                s"INSERT INTO ${c.database}.${c.table} FORMAT NDJSON")),
            body)
        }
    }
  }

  // ---- greptimedb_logs ----

  case class GreptimeLogsConfig(
      endpoint: String, dbname: String, table: String,
      pipelineName: String = "greptime_identity")
      extends Serializable

  def writeGreptimeLogs(df: DataFrame, cfg: GreptimeLogsConfig): Unit =
    NetworkSinks.writeHttpBody(df.select(eventJson(df).as("__line")),
      HttpConfig(
        uri = cfg.endpoint.stripSuffix("/") +
          s"/v1/events/logs?db=${cfg.dbname}&table=${cfg.table}" +
          s"&pipeline_name=${cfg.pipelineName}",
        framing = "character_delimited", delimiter = ",", maxEvents = 1000,
        contentType = "application/json",
        payloadPrefix = "[", payloadSuffix = "]"))
}
