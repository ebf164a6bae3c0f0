package graft.codecs

import java.io.{DataInputStream, OutputStream}

/** Minimal PostgreSQL v3 wire protocol client (the published frontend/
  * backend protocol) — enough for the `postgres` sink
  * (src/sinks/postgres/: jsonb_populate_recordset INSERT) and the
  * `postgresql_metrics` source (src/sources/postgresql_metrics.rs:
  * SELECTs against pg_stat_* views): StartupMessage (trust auth),
  * simple Query, RowDescription/DataRow decoding, ReadyForQuery sync.
  */
object Pg {

  final case class Result(columns: Seq[String], rows: Seq[Seq[String]],
                          complete: String)

  final class Conn(host: String, port: Int, user: String, database: String) {
    private val sock = new java.net.Socket(host, port)
    private val out: OutputStream =
      new java.io.BufferedOutputStream(sock.getOutputStream)
    private val in = new DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))

    startup()

    private def writeInt(n: Int): Unit = {
      out.write((n >> 24) & 0xff); out.write((n >> 16) & 0xff)
      out.write((n >> 8) & 0xff); out.write(n & 0xff)
    }

    private def startup(): Unit = {
      val params = new java.io.ByteArrayOutputStream()
      def cstr(s: String): Unit = {
        params.write(s.getBytes("UTF-8")); params.write(0)
      }
      cstr("user"); cstr(user); cstr("database"); cstr(database)
      params.write(0)
      val body = params.toByteArray
      writeInt(8 + body.length); writeInt(196608) // protocol 3.0
      out.write(body); out.flush()
      waitReady()
    }

    /** Read messages until ReadyForQuery; collect any result set. */
    private def waitReady(): Result = {
      var cols = Seq.empty[String]
      val rows = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var complete = ""
      var err: String = null
      while (true) {
        val t = in.readUnsignedByte().toChar
        val len = in.readInt()
        val body = new Array[Byte](len - 4)
        in.readFully(body)
        t match {
          case 'R' => // Authentication* — only Ok(0) is supported
            val code = java.nio.ByteBuffer.wrap(body, 0, 4).getInt
            if (code != 0)
              throw new java.io.IOException(s"pg: auth method $code unsupported")
          case 'T' => // RowDescription
            val bb = java.nio.ByteBuffer.wrap(body)
            val n = bb.getShort.toInt
            cols = (1 to n).map { _ =>
              val sb = new StringBuilder
              var c = bb.get()
              while (c != 0) { sb.append(c.toChar); c = bb.get() }
              bb.getInt; bb.getShort; bb.getInt; bb.getShort; bb.getInt
              bb.getShort
              sb.toString
            }
          case 'D' => // DataRow
            val bb = java.nio.ByteBuffer.wrap(body)
            val n = bb.getShort.toInt
            rows += (1 to n).map { _ =>
              val vlen = bb.getInt
              if (vlen < 0) null
              else {
                val v = new Array[Byte](vlen); bb.get(v)
                new String(v, "UTF-8")
              }
            }
          case 'C' => // CommandComplete
            complete = new String(body, 0, body.length - 1, "UTF-8")
          case 'E' => // ErrorResponse: fields (code byte + cstring)*
            val sb = new StringBuilder
            var i = 0
            while (i < body.length && body(i) != 0) {
              val kind = body(i).toChar; i += 1
              val start = i
              while (body(i) != 0) i += 1
              if (kind == 'M') sb.append(new String(body, start, i - start, "UTF-8"))
              i += 1
            }
            err = sb.toString
          case 'Z' => // ReadyForQuery
            if (err != null) throw new java.io.IOException(s"pg: $err")
            return Result(cols, rows.toSeq, complete)
          case _ => () // ParameterStatus, BackendKeyData, NoticeResponse…
        }
      }
      sys.error("unreachable")
    }

    def query(sql: String): Result = {
      val b = sql.getBytes("UTF-8")
      out.write('Q'); writeInt(4 + b.length + 1); out.write(b); out.write(0)
      out.flush()
      waitReady()
    }

    def close(): Unit = {
      try { out.write('X'); writeInt(4); out.flush() }
      catch { case _: Exception => () }
      sock.close()
    }
  }

  /** postgres://user@host:port/db → (host, port, user, database). */
  def parseUrl(url: String): (String, Int, String, String) = {
    val u = new java.net.URI(url)
    val user = Option(u.getUserInfo).map(_.split(":")(0)).getOrElse("postgres")
    (Option(u.getHost).getOrElse("127.0.0.1"),
      if (u.getPort > 0) u.getPort else 5432, user,
      Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
        .getOrElse(user))
  }

  def connect(url: String): Conn = {
    val (h, p, u, d) = parseUrl(url)
    new Conn(h, p, u, d)
  }

  /** Escape a string for a single-quoted SQL literal. */
  def quoteLiteral(s: String): String = "'" + s.replace("'", "''") + "'"
}
