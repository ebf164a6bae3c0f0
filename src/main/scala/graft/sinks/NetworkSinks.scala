package graft.sinks

import org.apache.spark.sql.DataFrame

/** Socket and HTTP sinks (reference src/sinks/socket.rs,
  * src/sinks/http/config.rs).
  *
  * Execution shape: events encode via one codegen'd projection
  * (LineCodec), then each task opens its OWN connection and streams its
  * partition — N executors push in parallel, no driver funnel. That is
  * the same fan-out a 1000-executor cluster needs; the receiving service
  * is expected to load-balance (as the reference assumes of its
  * downstream).
  */
object NetworkSinks {

  /** The `proxy:` global parsed from the active config (set by
    * ConfigLoader.run before sinks build; every HttpConfig picks it up
    * as its default).
    */
  @volatile var globalProxy: ProxyConfig = ProxyConfig()

  // ---- socket (src/sinks/socket.rs: mode tcp | udp | unix) ----

  case class SocketConfig(
      mode: String, // tcp | udp | unix
      address: String, // host:port for tcp/udp; path for unix
      codec: String = "text",
      framing: String = "newline_delimited",
      delimiter: String = "\n",
      // `tls:` (src/tls/settings.rs shape) — the CONFIG ships to the
      // executor; the SSLContext is built per task (not serializable)
      tls: graft.streaming.Tls.Config = graft.streaming.Tls.Config(),
      // codec-specific encoding options (e.g. encoding.cef.*)
      encConf: Map[String, Any] = Map.empty)
      extends Serializable

  def writeSocket(df: DataFrame, cfg: SocketConfig): Unit = {
    val lines = df.select(
      LineCodec.encodeLine(df, cfg.codec, cfg.encConf).as("__line"))
    val delim = LineCodec.frameDelimiter(cfg.framing, cfg.delimiter)
    val c = cfg
    lines.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      c.mode match {
        case "tcp" =>
          val (host, port) = splitHostPort(c.address)
          val sock = graft.streaming.Tls.clientSocketFactory(c.tls)
            .createSocket(host, port)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          try rows.foreach { r =>
            val b = LineCodec.rowBytes(r, 0)
            if (b != null) out.write(LineCodec.frameBytes(b, c.framing, delim))
          } finally { out.flush(); sock.close() }
        case "udp" =>
          val (host, port) = splitHostPort(c.address)
          val addr = java.net.InetAddress.getByName(host)
          val sock = new java.net.DatagramSocket()
          try rows.foreach { r =>
            val p0 = LineCodec.rowBytes(r, 0)
            if (p0 != null) {
              val b = LineCodec.frameBytes(p0, c.framing, delim)
              sock.send(new java.net.DatagramPacket(b, b.length, addr, port))
            }
          } finally sock.close()
        case "unix" =>
          val addr = java.net.UnixDomainSocketAddress.of(c.address)
          val ch = java.nio.channels.SocketChannel.open(
            java.net.StandardProtocolFamily.UNIX)
          ch.connect(addr)
          try rows.foreach { r =>
            val b0 = LineCodec.rowBytes(r, 0)
            if (b0 != null) {
              val buf = java.nio.ByteBuffer.wrap(
                LineCodec.frameBytes(b0, c.framing, delim))
              while (buf.hasRemaining) ch.write(buf)
            }
          } finally ch.close()
        case other =>
          throw new IllegalArgumentException(s"unsupported socket mode: $other")
      }
    }
  }

  private def splitHostPort(address: String): (String, Int) = {
    val i = address.lastIndexOf(':')
    (address.substring(0, i), address.substring(i + 1).toInt)
  }

  // ---- http (src/sinks/http/config.rs) ----

  /** The `proxy:` global (reference src/config/proxy.rs GlobalOptions:
    * enabled/http/https/no_proxy) — ships inside each sink's config so
    * executors apply it without driver state.
    */
  case class ProxyConfig(
      enabled: Boolean = false,
      http: Option[String] = None,
      https: Option[String] = None,
      noProxy: Seq[String] = Nil)
      extends Serializable {
    def forUri(uri: java.net.URI): Option[java.net.Proxy] = {
      if (!enabled) return None
      val host = Option(uri.getHost).getOrElse("")
      if (noProxy.exists(p => host == p || host.endsWith("." + p)))
        return None
      val chosen =
        if (uri.getScheme == "https") https.orElse(http) else http
      chosen.map { p =>
        val pu = new java.net.URI(
          if (p.contains("://")) p else s"http://$p")
        new java.net.Proxy(java.net.Proxy.Type.HTTP,
          new java.net.InetSocketAddress(pu.getHost,
            if (pu.getPort > 0) pu.getPort else 3128))
      }
    }
  }

  case class HttpConfig(
      uri: String,
      method: String = "post",
      codec: String = "json",
      framing: String = "newline_delimited",
      delimiter: String = "\n",
      compression: String = "none",
      // batch.max_events / batch.max_bytes (src/sinks/util/batch.rs) —
      // a request closes at whichever bound fills first; 0 = unbounded
      // bytes
      maxEvents: Int = 1000,
      maxBytes: Long = 0L,
      headers: Map[String, String] = Map.empty,
      contentType: String = "application/x-ndjson",
      // payload_prefix/payload_suffix wrap each request body
      // (http/config.rs:78,87 — e.g. "{\"data\":[" … "]}")
      payloadPrefix: String = "",
      payloadSuffix: String = "",
      // `tls:` for https:// endpoints beyond the JDK default roots
      // (custom ca_file, or verify_certificate: false)
      tls: graft.streaming.Tls.Config = graft.streaming.Tls.Config(),
      // defaults to the process-global `proxy:` setting AT CONSTRUCTION
      // (driver-side; the value serializes into the task closure), the
      // same process-global default semantics the reference gives
      // GlobalOptions.proxy
      proxy: ProxyConfig = NetworkSinks.globalProxy,
      // codec-specific encoding options (e.g. encoding.cef.*)
      encConf: Map[String, Any] = Map.empty)
      extends Serializable

  /** POST each task's events in batches of `maxEvents`. Returns nothing;
    * non-2xx responses throw (Spark retries the task — the reference's
    * retry layer, expressed through the engine's own fault tolerance).
    */
  def writeHttp(df: DataFrame, cfg: HttpConfig): Unit =
    writeHttpBody(
      df.select(LineCodec.encode(df, cfg.codec, cfg.encConf).as("__line")), cfg)

  /** Same transport, but the caller supplies the pre-built per-event (or
    * per-group) body lines — used by the envelope sinks (elasticsearch /
    * splunk_hec / loki / datadog), which build service-specific shapes.
    */
  /** Chunk rows by event count AND cumulative payload bytes — a batch
    * closes at whichever bound fills first (batch.rs semantics; a
    * single over-budget event still ships alone).
    */
  private[sinks] def chunked(rows: Iterator[org.apache.spark.sql.Row],
                             maxEvents: Int, maxBytes: Long)
      : Iterator[Seq[org.apache.spark.sql.Row]] =
    if (maxBytes <= 0L) rows.grouped(maxEvents).map(_.toSeq)
    else new Iterator[Seq[org.apache.spark.sql.Row]] {
      private val it = rows.buffered
      def hasNext: Boolean = it.hasNext
      def next(): Seq[org.apache.spark.sql.Row] = {
        val batch = Seq.newBuilder[org.apache.spark.sql.Row]
        var n = 0
        var bytes = 0L
        var full = false
        while (!full && it.hasNext && n < maxEvents) {
          val sz = Option(it.head.getString(0))
            .map(_.getBytes("UTF-8").length.toLong).getOrElse(0L)
          if (n > 0 && bytes + sz > maxBytes) full = true
          else {
            batch += it.next(); n += 1; bytes += sz
            if (bytes >= maxBytes) full = true
          }
        }
        batch.result()
      }
    }

  def writeHttpBody(lines: DataFrame, cfg: HttpConfig): Unit = {
    val c = cfg
    lines.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val delim = LineCodec.frameDelimiter(c.framing, c.delimiter)
      chunked(rows, c.maxEvents, c.maxBytes).foreach { batch =>
        val body = new java.io.ByteArrayOutputStream()
        val out = LineCodec.compress(body, c.compression)
        out.write(c.payloadPrefix.getBytes("UTF-8"))
        var first = true
        for (r <- batch) {
          val s = r.getString(0)
          if (s != null) {
            if (!first) out.write(delim)
            out.write(s.getBytes("UTF-8"))
            first = false
          }
        }
        out.write(c.payloadSuffix.getBytes("UTF-8"))
        out.close()
        post(c, body.toByteArray)
      }
    }
  }

  /** Binary-body transport for prometheus remote write: concatenate the
    * per-series WriteRequest fragments of each batch (proto concatenation
    * merges the repeated `timeseries` field), snappy-compress the whole
    * body (the remote-write framing — raw snappy block, not framed), and
    * POST with the protocol headers.
    */
  def writeProtoSnappy(fragments: DataFrame, cfg: HttpConfig): Unit = {
    val c = cfg
    fragments.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      rows.grouped(c.maxEvents).foreach { batch =>
        val raw = new java.io.ByteArrayOutputStream()
        batch.foreach { r =>
          val b = r.getAs[Array[Byte]](0)
          if (b != null) raw.write(b)
        }
        if (raw.size() > 0)
          post(c.copy(compression = "none"),
            org.xerial.snappy.Snappy.compress(raw.toByteArray))
      }
    }
  }

  /** Binary-body transport for protobuf envelopes (OTLP): concatenate
    * the per-event request fragments of each batch (proto concatenation
    * merges the repeated top-level field) and POST as one protobuf body.
    */
  def writeProtoConcat(fragments: DataFrame, cfg: HttpConfig): Unit = {
    val c = cfg
    fragments.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      rows.grouped(c.maxEvents).foreach { batch =>
        val raw = new java.io.ByteArrayOutputStream()
        batch.foreach { r =>
          val b = r.getAs[Array[Byte]](0)
          if (b != null) raw.write(b)
        }
        if (raw.size() > 0) post(c, raw.toByteArray)
      }
    }
  }

  private[sinks] def post(c: HttpConfig, body: Array[Byte]): Unit = {
    val uri = new java.net.URI(c.uri)
    val conn = (c.proxy.forUri(uri) match {
      case Some(p) => uri.toURL.openConnection(p)
      case None => uri.toURL.openConnection()
    }).asInstanceOf[java.net.HttpURLConnection]
    conn match {
      case https: javax.net.ssl.HttpsURLConnection if c.tls.enabled =>
        https.setSSLSocketFactory(
          graft.streaming.Tls.clientContext(c.tls).getSocketFactory)
        if (!c.tls.verifyCertificate || !c.tls.verifyHostname)
          https.setHostnameVerifier((_, _) => true)
      case _ => ()
    }
    conn.setRequestMethod(c.method.toUpperCase)
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", c.contentType)
    if (c.compression == "gzip")
      conn.setRequestProperty("Content-Encoding", "gzip")
    if (c.compression == "zstd")
      conn.setRequestProperty("Content-Encoding", "zstd")
    c.headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.getOutputStream.write(body)
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    // drain so keep-alive can reuse the connection
    try conn.getInputStream.readAllBytes()
    catch { case _: java.io.IOException => () }
    if (code < 200 || code >= 300)
      throw new java.io.IOException(s"http sink: $code from ${c.uri}")
  }
}
