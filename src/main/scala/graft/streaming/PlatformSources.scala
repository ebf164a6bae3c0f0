package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.JsonLite

/** Platform log sources:
  *
  *  - `journald` (src/sources/journald.rs) — spawns `journalctl --follow
  *    --all --show-cursor --output=json` (path configurable; tests use a
  *    stub), filters `_SYSTEMD_UNIT` by include/exclude_units, persists
  *    `__CURSOR` to a checkpoint file and restarts with
  *    `--after-cursor`, exactly the reference's resume contract.
  *  - `docker_logs` (src/sources/docker_logs/) — the Docker Engine API:
  *    `/containers/json` to discover, then a streaming
  *    `/containers/{id}/logs?follow=1&timestamps=1` per container,
  *    demultiplexing the 8-byte stream-frame header (stdout/stderr).
  *  - `kubernetes_logs` (src/sources/kubernetes_logs/) — tails
  *    `<root>/<namespace>_<pod>_<uid>/<container>/N.log` files in CRI
  *    format (`ts stream P|F line`), deriving pod metadata from the
  *    path, with partial-line (`P`) reassembly.
  *  - `okta` (src/sources/okta/) — polls `/api/v1/logs` with `SSWS`
  *    token auth and follows `Link rel="next"` pagination.
  */
object PlatformSources {

  // ---- journald ----

  final class JournaldSource(spark: SparkSession,
                             journalctlPath: String = "journalctl",
                             includeUnits: Set[String] = Set.empty,
                             excludeUnits: Set[String] = Set.empty,
                             checkpointPath: Option[String] = None,
                             extraArgs: Seq[String] = Nil) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (message, unit, timestamp_us, cursor, full-record json)
    private val mem = MemoryStream[(String, String, Long, String, String)]
    @volatile private var running = true
    @volatile private var proc: Process = null

    private def savedCursor: Option[String] = checkpointPath.flatMap { p =>
      val f = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(f))
        Some(new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim)
          .filter(_.nonEmpty)
      else None
    }

    private def saveCursor(c: String): Unit = checkpointPath.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        c.getBytes("UTF-8"))
    }

    private val thread = new Thread(() => {
      import scala.jdk.CollectionConverters._
      while (running) {
        try {
          val args = Seq(journalctlPath, "--follow", "--all",
            "--show-cursor", "--output=json") ++
            savedCursor.map(c => s"--after-cursor=$c") ++ extraArgs
          val pb = new ProcessBuilder(args.asJava)
          pb.redirectErrorStream(false)
          proc = pb.start()
          val rd = new java.io.BufferedReader(new java.io.InputStreamReader(
            proc.getInputStream, "UTF-8"))
          var line = rd.readLine()
          while (running && line != null) {
            if (line.startsWith("{")) {
              val rec = JsonLite.parse(line)
                .asInstanceOf[java.util.Map[String, Any]].asScala
              val unit = rec.get("_SYSTEMD_UNIT").map(_.toString).getOrElse("")
              val keep =
                (includeUnits.isEmpty || includeUnits.contains(unit)) &&
                  !excludeUnits.contains(unit)
              if (keep) {
                val cursor = rec.get("__CURSOR").map(_.toString).getOrElse("")
                if (cursor.nonEmpty) saveCursor(cursor)
                mem.addData((
                  rec.get("MESSAGE").map(_.toString).getOrElse(""),
                  unit,
                  rec.get("__REALTIME_TIMESTAMP").map(_.toString.toLong)
                    .getOrElse(0L),
                  cursor, line))
              }
            } else if (line.startsWith("-- cursor:")) {
              saveCursor(line.stripPrefix("-- cursor:").trim)
            }
            line = rd.readLine()
          }
          if (running) Thread.sleep(200) // journalctl exited; restart
        } catch {
          case _: Exception => if (running) Thread.sleep(500)
        }
      }
    }, "journald-source")
    thread.setDaemon(true)
    thread.start()

    def df: DataFrame = {
      val d = mem.toDF()
      d.select(d("_1").as("message"), d("_2").as("unit"),
        org.apache.spark.sql.functions.timestamp_micros(d("_3"))
          .as("timestamp"),
        d("_4").as("cursor"), d("_5").as("record"))
    }
    def stop(): Unit = {
      running = false
      Option(proc).foreach(_.destroy())
    }
  }

  // ---- docker_logs ----

  final class DockerLogsSource(spark: SparkSession, dockerHost: String,
                               includeContainers: Seq[String] = Nil,
                               excludeContainers: Seq[String] = Nil) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (container_id, container_name, image, created_at_epoch_s, stream,
    // timestamp iso, message)
    private val mem =
      MemoryStream[(String, String, String, Long, String, String, String)]
    @volatile private var running = true
    private val base = dockerHost
      .replaceFirst("^tcp://", "http://").stripSuffix("/")
    private val followed =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

    private def matches(name: String): Boolean =
      (includeContainers.isEmpty ||
        includeContainers.exists(name.startsWith)) &&
        !excludeContainers.exists(name.startsWith)

    private def follow(id: String, name: String, image: String,
                       createdAt: Long): Unit = {
      val t = new Thread(() => {
        try {
          val conn = new java.net.URI(s"$base/containers/$id/logs" +
            "?follow=true&stdout=true&stderr=true&timestamps=true")
            .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(conn.getInputStream))
          // multiplexed stream framing: [type 0|1|2, 0,0,0, len u32]
          while (running) {
            val hdr = new Array[Byte](8)
            in.readFully(hdr)
            val stream = hdr(0) match {
              case 2 => "stderr"
              case _ => "stdout"
            }
            val len = java.nio.ByteBuffer.wrap(hdr, 4, 4).getInt
            val payload = new Array[Byte](len); in.readFully(payload)
            new String(payload, "UTF-8").split("\n").foreach { line =>
              if (line.nonEmpty) {
                val sp = line.indexOf(' ')
                val (ts, msg) =
                  if (sp > 0) (line.substring(0, sp), line.substring(sp + 1))
                  else ("", line)
                mem.addData((id, name, image, createdAt, stream, ts, msg))
              }
            }
          }
        } catch { case _: Exception => followed.remove(id) }
      }, s"docker-logs-$name")
      t.setDaemon(true); t.start()
    }

    private val discoverThread = new Thread(() => {
      import scala.jdk.CollectionConverters._
      while (running) {
        try {
          val conn = new java.net.URI(s"$base/containers/json").toURL
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
          JsonLite.parse(body).asInstanceOf[java.util.List[Any]].asScala
            .map(_.asInstanceOf[java.util.Map[String, Any]].asScala)
            .foreach { c =>
              val id = c.get("Id").map(_.toString).getOrElse("")
              val name = c.get("Names")
                .map(_.asInstanceOf[java.util.List[Any]].asScala
                  .headOption.map(_.toString.stripPrefix("/")).getOrElse(""))
                .getOrElse("")
              val image = c.get("Image").map(_.toString).getOrElse("")
              // docker's container list carries Created (epoch secs) —
              // the docs' container_created_at output field
              val created = c.get("Created")
                .flatMap(x => scala.util.Try(x.toString.toDouble.toLong)
                  .toOption).getOrElse(0L)
              if (id.nonEmpty && matches(name) && followed.add(id))
                follow(id, name, image, created)
            }
        } catch { case _: Exception => () }
        Thread.sleep(1000)
      }
    }, "docker-logs-discover")
    discoverThread.setDaemon(true)
    discoverThread.start()

    def df: DataFrame = {
      import org.apache.spark.sql.functions.timestamp_seconds
      val d = mem.toDF()
      d.select(d("_1").as("container_id"), d("_2").as("container_name"),
        d("_3").as("image"),
        timestamp_seconds(d("_4")).as("container_created_at"),
        d("_5").as("stream"),
        d("_6").cast("timestamp").as("timestamp"), d("_7").as("message"))
    }
    def stop(): Unit = running = false
  }

  // ---- kubernetes_logs ----

  final class K8sLogsSource(spark: SparkSession, root: String) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (namespace, pod, uid, container, stream, ts, message, file)
    private val mem = MemoryStream[
      (String, String, String, String, String, String, String, String)]
    private val offsets =
      scala.collection.mutable.Map.empty[String, Long]
    // partial-line (CRI `P` flag) reassembly buffer, keyed by (file, stream)
    private val partial =
      scala.collection.mutable.Map.empty[(String, String), StringBuilder]

    /** Scan + ingest appended CRI lines once; returns lines emitted. */
    def poll(): Int = synchronized {
      import scala.jdk.CollectionConverters._
      var n = 0
      val rootPath = java.nio.file.Paths.get(root)
      if (!java.nio.file.Files.isDirectory(rootPath)) return 0
      java.nio.file.Files.list(rootPath).iterator().asScala
        .filter(java.nio.file.Files.isDirectory(_)).foreach { podDir =>
          val dirName = podDir.getFileName.toString
          dirName.split("_") match {
            case Array(ns, pod, uid) =>
              java.nio.file.Files.list(podDir).iterator().asScala
                .filter(java.nio.file.Files.isDirectory(_))
                .foreach { containerDir =>
                  val container = containerDir.getFileName.toString
                  java.nio.file.Files.list(containerDir).iterator().asScala
                    .filter(_.toString.endsWith(".log")).foreach { f =>
                      n += ingest(f, ns, pod, uid, container)
                    }
                }
            case _ => ()
          }
        }
      n
    }

    private def ingest(f: java.nio.file.Path, ns: String, pod: String,
                       uid: String, container: String): Int = {
      val key = f.toString
      val size = java.nio.file.Files.size(f)
      val start = offsets.getOrElse(key, 0L)
      if (size <= start) return 0
      val ch = java.nio.file.Files.newByteChannel(f)
      var n = 0
      try {
        ch.position(start)
        val buf = java.nio.ByteBuffer.allocate((size - start).toInt)
        ch.read(buf)
        val text = new String(buf.array(), 0, buf.position(), "UTF-8")
        val complete = text.lastIndexOf('\n')
        if (complete < 0) return 0
        offsets(key) = start + text.substring(0, complete + 1)
          .getBytes("UTF-8").length
        text.substring(0, complete).split("\n").foreach { line =>
          // CRI: <rfc3339-ns-ts> <stdout|stderr> <P|F> <content>
          val parts = line.split(" ", 4)
          if (parts.length == 4) {
            val Array(ts, stream, flag, content) = parts
            val pkey = (key, stream)
            flag match {
              case "P" =>
                partial.getOrElseUpdate(pkey, new StringBuilder)
                  .append(content)
              case _ =>
                val full = partial.remove(pkey)
                  .map(_.append(content).toString).getOrElse(content)
                mem.addData((ns, pod, uid, container, stream, ts, full, key))
                n += 1
            }
          }
        }
      } finally ch.close()
      n
    }

    def df: DataFrame = {
      import org.apache.spark.sql.functions.struct
      val d = mem.toDF()
      // metadata nests under `kubernetes.*` like the reference
      // (sources/kubernetes_logs docs: kubernetes.pod_name,
      // kubernetes.container_name, … as nested output fields)
      d.select(
        struct(
          d("_1").as("pod_namespace"), d("_2").as("pod_name"),
          d("_3").as("pod_uid"), d("_4").as("container_name"))
          .as("kubernetes"),
        d("_5").as("stream"), d("_6").cast("timestamp").as("timestamp"),
        d("_7").as("message"), d("_8").as("file"))
    }
  }

  // ---- okta ----

  final class OktaSource(spark: SparkSession, domain: String, token: String,
                         sinceSecs: Long = 600, intervalSecs: Int = 10) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[String]
    @volatile private var running = true
    private val base =
      if (domain.startsWith("http")) domain.stripSuffix("/")
      else s"https://$domain"

    /** One poll across all pagination pages; returns events emitted. */
    def pollOnce(): Int = {
      import scala.jdk.CollectionConverters._
      val since = java.time.Instant.now().minusSeconds(sinceSecs)
        .truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
      var url: String = s"$base/api/v1/logs?since=$since&limit=100"
      var n = 0
      while (url != null && running) {
        val conn = new java.net.URI(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestProperty("Authorization", s"SSWS $token")
        conn.setRequestProperty("Accept", "application/json")
        val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
        val events = JsonLite.parse(body)
          .asInstanceOf[java.util.List[Any]].asScala
        events.foreach { e => mem.addData(JsonLite.render(e)); n += 1 }
        // Link: <url>; rel="next" pagination (client.rs:102-108)
        url = Option(conn.getHeaderFields.get("Link"))
          .map(_.asScala).getOrElse(Nil)
          .filter(_.contains("rel=\"next\""))
          .flatMap { l =>
            val i = l.indexOf('<'); val j = l.indexOf('>')
            if (i >= 0 && j > i) Some(l.substring(i + 1, j)) else None
          }.headOption.filter(_ => events.nonEmpty).orNull
      }
      n
    }

    private val thread = new Thread(() => {
      while (running) {
        try pollOnce()
        catch { case _: Exception => () }
        Thread.sleep(intervalSecs * 1000L)
      }
    }, "okta-source")
    thread.setDaemon(true)
    def startPolling(): Unit = thread.start()

    def df: DataFrame = mem.toDF().withColumnRenamed("value", "message")
    def stop(): Unit = running = false
  }

  def journald(spark: SparkSession, journalctlPath: String = "journalctl",
               includeUnits: Set[String] = Set.empty,
               excludeUnits: Set[String] = Set.empty,
               checkpointPath: Option[String] = None,
               extraArgs: Seq[String] = Nil): JournaldSource =
    new JournaldSource(spark, journalctlPath, includeUnits, excludeUnits,
      checkpointPath, extraArgs)
  def dockerLogs(spark: SparkSession, dockerHost: String,
                 includeContainers: Seq[String] = Nil,
                 excludeContainers: Seq[String] = Nil): DockerLogsSource =
    new DockerLogsSource(spark, dockerHost, includeContainers,
      excludeContainers)
  def k8sLogs(spark: SparkSession, root: String): K8sLogsSource =
    new K8sLogsSource(spark, root)
  def okta(spark: SparkSession, domain: String, token: String,
           sinceSecs: Long = 600, intervalSecs: Int = 10): OktaSource =
    new OktaSource(spark, domain, token, sinceSecs, intervalSecs)
}
