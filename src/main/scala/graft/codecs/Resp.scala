package graft.codecs

import java.io.{DataInputStream, OutputStream}

/** Minimal RESP (REdis Serialization Protocol) encoder/decoder — the
  * wire format behind the `redis` sink (reference src/sinks/redis/) and
  * source (src/sources/redis/). Self-contained: commands are arrays of
  * bulk strings; replies are simple strings, errors, integers, bulk
  * strings, arrays, or nil.
  */
object Resp {

  private val CRLF = "\r\n".getBytes("UTF-8")

  def writeCommand(out: OutputStream, args: Seq[String]): Unit = {
    out.write(s"*${args.length}".getBytes("UTF-8")); out.write(CRLF)
    args.foreach { a =>
      val b = a.getBytes("UTF-8")
      out.write(s"$$${b.length}".getBytes("UTF-8")); out.write(CRLF)
      out.write(b); out.write(CRLF)
    }
  }

  sealed trait Reply
  final case class SimpleString(v: String) extends Reply
  final case class Error(v: String) extends Reply
  final case class IntegerReply(v: Long) extends Reply
  final case class BulkString(v: String) extends Reply
  final case class ArrayReply(v: Vector[Reply]) extends Reply
  case object NilReply extends Reply

  private def readLine(in: DataInputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new java.io.EOFException("resp: end of stream")
      sb.append(c.toChar)
      c = in.read()
    }
    in.read() // \n
    sb.toString
  }

  def readReply(in: DataInputStream): Reply = {
    val t = in.read()
    if (t < 0) throw new java.io.EOFException("resp: end of stream")
    t.toChar match {
      case '+' => SimpleString(readLine(in))
      case '-' => Error(readLine(in))
      case ':' => IntegerReply(readLine(in).toLong)
      case '$' =>
        val n = readLine(in).toInt
        if (n < 0) NilReply
        else {
          val b = new Array[Byte](n); in.readFully(b)
          in.read(); in.read() // trailing CRLF
          BulkString(new String(b, "UTF-8"))
        }
      case '*' =>
        val n = readLine(in).toInt
        if (n < 0) NilReply
        else ArrayReply(Vector.fill(n)(readReply(in)))
      case other =>
        throw new java.io.IOException(s"resp: bad reply marker '$other'")
    }
  }

  /** `redis://host:port[/db]` → (host, port). */
  def hostPort(url: String): (String, Int) = {
    val u = new java.net.URI(url)
    (Option(u.getHost).getOrElse("127.0.0.1"),
      if (u.getPort > 0) u.getPort else 6379)
  }
}
