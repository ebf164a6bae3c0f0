package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.codecs.MsgPack
import graft.codecs.MsgPack._

/** The agent-protocol server sources: `fluent` (fluentd/fluent-bit
  * forward protocol over tcp — reference src/sources/fluent/, protocol
  * per the published Forward-Protocol-Specification-v1) and `logstash`
  * (the beats/lumberjack v2 protocol — reference src/sources/logstash.rs).
  *
  * Same shape as the other push sources: a driver-side listener feeds a
  * MemoryStream; the single listener is the documented scale boundary
  * (the reference is likewise one listener per instance; fleets put a
  * TCP load balancer in front).
  */
object AgentSources {

  /** fluent forward events: (tag, epoch_ms, record-as-JSON). */
  final case class FluentEvent(tag: String, timestamp_ms: Long, message: String)

  /** `fluent` source. Handles all the spec's event modes — Message
    * `[tag, time, record]` (± options), Forward `[tag, [[t,r],…]]`
    * (± options), PackedForward (entries as a concatenated-msgpack bin)
    * and CompressedPackedForward (gzip, `compressed: "gzip"` option) —
    * plus the EventTime ext (type 0: u32 sec + u32 ns) and the ack
    * contract: an options map carrying `chunk` gets the msgpack reply
    * `{"ack": <chunk>}` (src/sources/fluent/mod.rs ack handling).
    */
  final class FluentSource(spark: SparkSession, port: Int = 0) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[FluentEvent]
    private val server = new java.net.ServerSocket(port)
    @volatile private var running = true

    private def timeMs(v: Value): Long = v match {
      case MpLong(sec) => sec * 1000L
      case MpDouble(sec) => (sec * 1000L).toLong
      case MpExt(0, d) if d.length == 8 =>
        val bb = java.nio.ByteBuffer.wrap(d)
        (bb.getInt.toLong & 0xffffffffL) * 1000L +
          (bb.getInt.toLong & 0xffffffffL) / 1000000L
      case _ => System.currentTimeMillis()
    }

    private def entryEvents(tag: String, entries: Seq[Value]): Seq[FluentEvent] =
      entries.collect { case MpArray(Vector(t, record)) =>
        FluentEvent(tag, timeMs(t), MsgPack.toJson(record))
      }

    private def unpackEntries(bytes: Array[Byte]): Seq[Value] = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = Vector.newBuilder[Value]
      try while (true) buf += MsgPack.read(in)
      catch { case _: java.io.EOFException => () }
      buf.result()
    }

    private def handle(sock: java.net.Socket): Unit = {
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      try while (true) {
        val msg = MsgPack.read(in)
        msg match {
          case MpArray(parts) if parts.nonEmpty =>
            val tag = parts.head match {
              case MpString(s) => s
              case other => MsgPack.toJson(other)
            }
            val options = parts.lastOption.collect {
              case MpMap(kvs) => kvs.collect {
                case (MpString(k), v) => k -> v
              }.toMap
            }.getOrElse(Map.empty[String, Value])
            val events: Seq[FluentEvent] = parts match {
              // Forward: [tag, [[time, record], …], options?]
              case Vector(_, MpArray(entries), _*)
                  if entries.forall(_.isInstanceOf[MpArray]) =>
                entryEvents(tag, entries)
              // PackedForward / CompressedPackedForward:
              // [tag, bin-of-concatenated-entries, options?]
              case Vector(_, MpBytes(b), _*) =>
                val raw = options.get("compressed") match {
                  case Some(MpString("gzip")) =>
                    new java.util.zip.GZIPInputStream(
                      new java.io.ByteArrayInputStream(b)).readAllBytes()
                  case _ => b
                }
                entryEvents(tag, unpackEntries(raw))
              // Message: [tag, time, record, options?]
              case Vector(_, t, record, _*) =>
                Seq(FluentEvent(tag, timeMs(t), MsgPack.toJson(record)))
              case _ => Nil
            }
            if (events.nonEmpty) mem.synchronized { mem.addData(events) }
            // ack contract: echo the chunk id back as {"ack": chunk}
            options.get("chunk").foreach { chunk =>
              MsgPack.write(out,
                MpMap(Vector(MpString("ack") -> chunk)))
              out.flush()
            }
          case MpNil => () // heartbeat
          case _ => ()
        }
      } catch { case _: java.io.IOException => () }
      finally sock.close()
    }

    private val acceptThread = new Thread(() => {
      try while (running) {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "fluent-conn")
        t.setDaemon(true); t.start()
      } catch { case _: java.io.IOException => () }
    }, "fluent-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()

    def boundPort: Int = server.getLocalPort
    def df: DataFrame = {
      val d = mem.toDF()
      d.select(d("tag"),
        org.apache.spark.sql.functions
          .timestamp_millis(d("timestamp_ms")).as("timestamp"),
        d("message"))
    }
    def stop(): Unit = { running = false; server.close() }
  }

  /** `logstash` source — the beats/lumberjack v2 wire protocol
    * (src/sources/logstash.rs:434-500 frame types): per frame a
    * protocol-version byte (`1`/`2`) and a type byte — `W` window size,
    * `J` json payload (v2), `D` key/value data (v1), `C` zlib-compressed
    * batch of frames, `A` ack. The server acks the batch's final
    * sequence number once `window_size` events arrive
    * (logstash.rs:273-311: real clients send exactly `window_size`
    * events per batch, and a partial ack would be rejected).
    */
  final class LogstashSource(spark: SparkSession, port: Int = 0) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[String]
    private val server = new java.net.ServerSocket(port)
    @volatile private var running = true

    private final class ConnState {
      var version: Byte = '2'
      var windowSize: Long = 0L
      var seen: Long = 0L
      var lastSeq: Long = 0L
    }

    private def readFrames(in: java.io.DataInputStream, st: ConnState,
                           out: java.io.DataOutputStream): Unit = {
      while (true) {
        st.version = in.readByte()
        val tpe = in.readByte().toChar
        tpe match {
          case 'W' =>
            st.windowSize = in.readInt().toLong & 0xffffffffL
            st.seen = 0L
          case 'J' =>
            st.lastSeq = in.readInt().toLong & 0xffffffffL
            val len = in.readInt()
            val payload = new Array[Byte](len)
            in.readFully(payload)
            mem.synchronized { mem.addData(new String(payload, "UTF-8")) }
            st.seen += 1
            maybeAck(st, out)
          case 'D' =>
            st.lastSeq = in.readInt().toLong & 0xffffffffL
            val n = in.readInt()
            val fields = (1 to n).map { _ =>
              val k = new Array[Byte](in.readInt()); in.readFully(k)
              val v = new Array[Byte](in.readInt()); in.readFully(v)
              (new String(k, "UTF-8"), new String(v, "UTF-8"))
            }
            mem.synchronized {
              mem.addData(MsgPack.toJson(MpMap(fields.map { case (k, v) =>
                (MpString(k): Value) -> (MpString(v): Value) }.toVector)))
            }
            st.seen += 1
            maybeAck(st, out)
          case 'C' =>
            val len = in.readInt()
            val deflated = new Array[Byte](len)
            in.readFully(deflated)
            val inflated = new java.util.zip.InflaterInputStream(
              new java.io.ByteArrayInputStream(deflated)).readAllBytes()
            readFramesFully(inflated, st, out)
          case other =>
            throw new java.io.IOException(s"logstash: bad frame '$other'")
        }
      }
    }

    private def readFramesFully(bytes: Array[Byte], st: ConnState,
                                out: java.io.DataOutputStream): Unit = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try readFrames(in, st, out)
      catch { case _: java.io.EOFException => () }
    }

    private def maybeAck(st: ConnState, out: java.io.DataOutputStream): Unit =
      if (st.windowSize > 0 && st.seen >= st.windowSize) {
        out.writeByte(st.version.toInt)
        out.writeByte('A')
        out.writeInt(st.lastSeq.toInt)
        out.flush()
        st.seen = 0L
      }

    private def handle(sock: java.net.Socket): Unit = {
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      try readFrames(in, new ConnState, out)
      catch { case _: java.io.IOException => () }
      finally sock.close()
    }

    private val acceptThread = new Thread(() => {
      try while (running) {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "logstash-conn")
        t.setDaemon(true); t.start()
      } catch { case _: java.io.IOException => () }
    }, "logstash-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()

    def boundPort: Int = server.getLocalPort
    def df: DataFrame = mem.toDF().withColumnRenamed("value", "message")
    def stop(): Unit = { running = false; server.close() }
  }

  def fluent(spark: SparkSession, port: Int = 0): FluentSource =
    new FluentSource(spark, port)
  def logstash(spark: SparkSession, port: Int = 0): LogstashSource =
    new LogstashSource(spark, port)
}
