package graft.streaming

import io.netty.bootstrap.{Bootstrap, ServerBootstrap}
import io.netty.channel._
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.{NioServerSocketChannel, NioSocketChannel}
import io.netty.handler.codec.http2._

/** Minimal gRPC transport over cleartext HTTP/2 (h2c prior knowledge),
  * built directly on the netty-codec-http2 classes Spark ships — no
  * grpc-java involved. Covers unary calls: the request is one gRPC
  * frame (1-byte compressed flag + u32 BE length + protobuf bytes) on
  * one h2 stream; the response is headers + one frame + trailers with
  * `grpc-status`. That is the published gRPC-over-HTTP/2 wire spec
  * subset the reference's `vector` source/sink pair
  * (src/sources/vector/, src/sinks/vector/ — proto
  * lib/vector-core/proto/vector.proto: Vector/PushEvents over
  * EventWrapper payloads) actually exercises for event push.
  */
object Grpc {

  // ---- gRPC message framing -------------------------------------------

  def frame(msg: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + msg.length)
    out(0) = 0 // uncompressed
    out(1) = ((msg.length >>> 24) & 0xFF).toByte
    out(2) = ((msg.length >>> 16) & 0xFF).toByte
    out(3) = ((msg.length >>> 8) & 0xFF).toByte
    out(4) = (msg.length & 0xFF).toByte
    System.arraycopy(msg, 0, out, 5, msg.length)
    out
  }

  /** All messages in a (possibly multi-frame) gRPC body. */
  def unframe(body: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i + 5 <= body.length) {
      val n = ((body(i + 1) & 0xFF) << 24) | ((body(i + 2) & 0xFF) << 16) |
        ((body(i + 3) & 0xFF) << 8) | (body(i + 4) & 0xFF)
      if (i + 5 + n > body.length) i = body.length
      else {
        out += java.util.Arrays.copyOfRange(body, i + 5, i + 5 + n)
        i += 5 + n
      }
    }
    out.result()
  }

  // ---- server ---------------------------------------------------------

  /** Unary gRPC server: `handler(path, requestProto) => responseProto`.
    * Throwing marks the RPC with grpc-status 2 (UNKNOWN).
    */
  final class Server(port: Int,
                     handler: (String, Array[Byte]) => Array[Byte],
                     bindHost: String = "0.0.0.0") {
    private val boss = new NioEventLoopGroup(1)
    private val workers = new NioEventLoopGroup(2)
    private val ch = new ServerBootstrap()
      .group(boss, workers)
      .channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[SocketChannel] {
        override def initChannel(c: SocketChannel): Unit = {
          c.pipeline.addLast(Http2FrameCodecBuilder.forServer().build())
          c.pipeline.addLast(new Http2MultiplexHandler(
            new ChannelInitializer[Channel] {
              override def initChannel(stream: Channel): Unit =
                stream.pipeline.addLast(new StreamHandler)
            }))
        }
      })
      // bind the CONFIGURED host (reference default 0.0.0.0) — a
      // loopback-only listener can't serve the two-tier
      // agent-to-aggregator topology
      .bind(bindHost, port).sync().channel()

    private final class StreamHandler extends ChannelInboundHandlerAdapter {
      private var path = ""
      private val buf = new java.io.ByteArrayOutputStream()

      override def channelRead(ctx: ChannelHandlerContext, msg: Any): Unit =
        msg match {
          case h: Http2HeadersFrame =>
            path = String.valueOf(h.headers.path)
            if (h.isEndStream) respond(ctx)
          case d: Http2DataFrame =>
            val b = new Array[Byte](d.content.readableBytes())
            d.content.readBytes(b)
            d.release()
            buf.write(b)
            if (d.isEndStream) respond(ctx)
          case other => io.netty.util.ReferenceCountUtil.release(other)
        }

      private def respond(ctx: ChannelHandlerContext): Unit = {
        val req = unframe(buf.toByteArray).headOption
          .getOrElse(Array.emptyByteArray)
        val (status, body) =
          try ("0", handler(path, req))
          catch { case _: Exception => ("2", Array.emptyByteArray) }
        val headers = new DefaultHttp2Headers()
        headers.status("200")
        headers.set("content-type", "application/grpc+proto")
        ctx.write(new DefaultHttp2HeadersFrame(headers))
        if (body.nonEmpty)
          ctx.write(new DefaultHttp2DataFrame(
            io.netty.buffer.Unpooled.wrappedBuffer(frame(body))))
        val trailers = new DefaultHttp2Headers()
        trailers.set("grpc-status", status)
        ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers, true))
      }
    }

    def boundPort: Int =
      ch.localAddress.asInstanceOf[java.net.InetSocketAddress].getPort
    def stop(): Unit = {
      ch.close().sync()
      boss.shutdownGracefully(0, 100, java.util.concurrent.TimeUnit.MILLISECONDS)
      workers.shutdownGracefully(0, 100, java.util.concurrent.TimeUnit.MILLISECONDS)
    }
  }

  // ---- the vector source/sink gRPC pair -------------------------------

  /** `vector` gRPC receive side (src/sources/vector/ — vector.proto
    * Vector/PushEvents of PushEventsRequest{repeated EventWrapper
    * events=1}): each pushed EventWrapper decodes through the native
    * codec into (message-json, kind) rows.
    */
  final class VectorPushSource(spark: org.apache.spark.sql.SparkSession,
                               port: Int,
                               bindHost: String = "0.0.0.0") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    private val mem = MemoryStream[(String, String)]
    private val server = new Server(port, (path, req) => {
      if (!path.endsWith("/PushEvents") && !path.endsWith("/HealthCheck"))
        throw new IllegalArgumentException(s"unknown rpc $path")
      if (path.endsWith("/PushEvents")) {
        // PushEventsRequest: repeated EventWrapper events = 1
        val events = Seq.newBuilder[(String, String)]
        var i = 0
        def varint(): Long = {
          var shift = 0; var out = 0L; var b = 0
          do { b = req(i) & 0xFF; i += 1
               out |= (b & 0x7FL) << shift; shift += 7
          } while ((b & 0x80) != 0 && shift < 70)
          out
        }
        while (i < req.length) {
          val tag = varint()
          if ((tag >>> 3) == 1 && (tag & 7) == 2) {
            val n = varint().toInt
            val wrapper = java.util.Arrays.copyOfRange(req, i, i + n)
            i += n
            // one malformed wrapper must not fail the whole PushEvents
            // RPC (which would drop every event in the batch)
            try graft.codecs.NativeCodec.decodeWrapper(wrapper) match {
              case null => ()
              case (kind, json) => events += ((json, kind))
            } catch { case _: Exception => () }
          } else i = req.length
        }
        val built = events.result()
        // netty dispatches handlers on multiple worker threads;
        // MemoryStream.addData is not thread-safe
        if (built.nonEmpty) mem.synchronized { mem.addData(built) }
      }
      Array.emptyByteArray // PushEventsResponse / HealthCheckResponse {}
    }, bindHost)
    def boundPort: Int = server.boundPort
    def df: org.apache.spark.sql.DataFrame =
      mem.toDF().selectExpr("_1 as message", "_2 as __event_kind")
    def stop(): Unit = server.stop()
  }

  /** `vector` gRPC send side (src/sinks/vector/): each task batches its
    * events into PushEventsRequests of `maxEvents` EventWrappers.
    */
  def pushEvents(host: String, port: Int,
                 eventJsons: Seq[String], maxEvents: Int = 500): Unit =
    eventJsons.grouped(math.max(1, maxEvents)).foreach { group =>
      val out = new java.io.ByteArrayOutputStream()
      group.foreach { json =>
        val w = graft.codecs.NativeCodec.encodeWrapper(json)
        // field 1, wire 2
        out.write(0x0A)
        var v = w.length.toLong
        while ((v & ~0x7FL) != 0) {
          out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
        out.write(v.toInt)
        out.write(w)
      }
      call(host, port, "/vector.Vector/PushEvents", out.toByteArray)
    }

  // ---- client ---------------------------------------------------------

  /** One unary call: returns the response protobuf, or throws on a
    * non-zero grpc-status / transport failure.
    */
  def call(host: String, port: Int, path: String,
           request: Array[Byte], timeoutMs: Long = 10000): Array[Byte] = {
    val group = new NioEventLoopGroup(1)
    try {
      val done = new java.util.concurrent.CompletableFuture[Array[Byte]]()
      val body = new java.io.ByteArrayOutputStream()
      val init = new ChannelInitializer[SocketChannel] {
        override def initChannel(c: SocketChannel): Unit = {
          c.pipeline.addLast(Http2FrameCodecBuilder.forClient().build())
          c.pipeline.addLast(new Http2MultiplexHandler(
            // inbound server-pushed streams are not expected; sink them
            new ChannelInboundHandlerAdapter))
        }
      }
      val ch = new Bootstrap().group(group)
        .channel(classOf[NioSocketChannel])
        .handler(init)
        .connect(host, port).sync().channel()
      val streamBoot = new Http2StreamChannelBootstrap(ch)
      streamBoot.handler(new ChannelInboundHandlerAdapter {
        override def channelRead(ctx: ChannelHandlerContext, msg: Any): Unit =
          msg match {
            case h: Http2HeadersFrame =>
              val st = h.headers.get("grpc-status")
              if (st != null && String.valueOf(st) != "0")
                done.completeExceptionally(new RuntimeException(
                  s"grpc-status ${st}"))
              else if (h.isEndStream) done.complete(unframe(
                body.toByteArray).headOption.getOrElse(Array.emptyByteArray))
            case d: Http2DataFrame =>
              val b = new Array[Byte](d.content.readableBytes())
              d.content.readBytes(b)
              d.release()
              body.write(b)
              if (d.isEndStream) done.complete(unframe(body.toByteArray)
                .headOption.getOrElse(Array.emptyByteArray))
            case other => io.netty.util.ReferenceCountUtil.release(other)
          }
      })
      val stream = streamBoot.open().sync().getNow
      val headers = new DefaultHttp2Headers()
      headers.method("POST").scheme("http").path(path)
        .authority(s"$host:$port")
      headers.set("content-type", "application/grpc+proto")
      headers.set("te", "trailers")
      stream.write(new DefaultHttp2HeadersFrame(headers))
      stream.writeAndFlush(new DefaultHttp2DataFrame(
        io.netty.buffer.Unpooled.wrappedBuffer(frame(request)), true))
      val out = done.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      ch.close().sync()
      out
    } finally group.shutdownGracefully(
      0, 100, java.util.concurrent.TimeUnit.MILLISECONDS)
  }
}
