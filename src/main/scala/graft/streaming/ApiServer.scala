package graft.streaming

/** The `api:` global (reference src/api/ — `api.enabled`,
  * `api.address`, default 127.0.0.1:8686): a local HTTP endpoint for
  * health checks and component observability, the surface `vector top`
  * connects to. The reference serves GraphQL (async-graphql +
  * playground); here the same data answers:
  *
  *  - `GET /health` → `{"ok": true}` (the reference's health route)
  *  - `POST /graphql` with the canonical `{ health }` and
  *    `{ components { ... } }` query shapes → GraphQL-response-shaped
  *    JSON over the live topology + internal metric registry
  *  - `GET /api/components` → the same component list REST-shaped
  *
  * The full GraphQL type system / subscriptions / playground are a
  * documented boundary (no GraphQL stack in-sandbox); the data parity —
  * component ids, kinds, received/sent event totals from the registry —
  * is what the reference's API exposes for `top`.
  */
final class ApiServer(port: Int,
                      components: () => Seq[(String, String, String)],
                      reg: InternalObs.Registry = InternalObs.registry,
                      host: String = "127.0.0.1") {

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** (component_id → (received_total, sent_total)) from the registry. */
  private def totals(): Map[String, (Double, Double)] = {
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val rows = reg.snapshot("vector", Map.empty, now)
    def byId(metric: String): Map[String, Double] = rows
      .filter(_.name == metric)
      .groupBy(_.tags.getOrElse("component_id", ""))
      .map { case (id, rs) =>
        id -> rs.flatMap(r => r.counter_value.orElse(r.gauge_value)).sum }
    val recv = byId("component_received_events_total")
    val sent = byId("component_sent_events_total")
    (recv.keySet ++ sent.keySet).map(id =>
      id -> (recv.getOrElse(id, 0.0), sent.getOrElse(id, 0.0))).toMap
  }

  private def componentsJson(): String = {
    val t = totals()
    components().map { case (id, kind, tpe) =>
      val (r, s) = t.getOrElse(id, (0.0, 0.0))
      s"""{"componentId":"${esc(id)}","componentKind":"${esc(kind)}",""" +
        s""""componentType":"${esc(tpe)}",""" +
        s""""receivedEventsTotal":${r.toLong},""" +
        s""""sentEventsTotal":${s.toLong}}"""
    }.mkString("[", ",", "]")
  }

  // Bind the configured host (reference defaults api.address to
  // 127.0.0.1:8686 precisely so this unauthenticated endpoint stays
  // loopback-only unless the operator opts out).
  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress(host, port), 0)

  private def reply(ex: com.sun.net.httpserver.HttpExchange, code: Int,
                    body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  server.createContext("/health", ex => reply(ex, 200, """{"ok":true}"""))
  server.createContext("/api/components",
    ex => reply(ex, 200, componentsJson()))
  server.createContext("/graphql", ex => {
    val q = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    val body =
      if (q.contains("components"))
        s"""{"data":{"components":{"nodes":${componentsJson()}}}}"""
      else if (q.contains("health")) """{"data":{"health":true}}"""
      else if (q.contains("meta"))
        """{"data":{"meta":{"versionString":"vectorspark"}}}"""
      else """{"errors":[{"message":"unsupported query"}]}"""
    reply(ex, 200, body)
  })
  server.setExecutor(null)
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}
