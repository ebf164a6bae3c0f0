package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `file` source with tail fidelity: per-file byte offsets keyed by a
  * content FINGERPRINT (not path), so log rotation by rename continues
  * from the old offset and a recreated path restarts from zero — plus a
  * durable offset checkpoint.
  *
  * Reference: /root/reference/src/sources/file.rs:95-103,166-189 —
  * fingerprinting via a checksum of the file head, offsets persisted in
  * a checkpoint file, partial last lines held back until the newline
  * arrives. (Spark's built-in file stream treats files as immutable;
  * this driver-side tailer is the reference-shaped alternative for
  * append-mode logs; emitted lines flow into a MemoryStream.)
  */
final class FileTailSource(spark: SparkSession, dir: String,
                           checkpoint: Option[String] = None,
                           // file.rs option set: `include`/`exclude`
                           // glob patterns on the FILE NAME,
                           // `ignore_older_secs` skips files whose
                           // mtime is older than the cutoff
                           // (file_server.rs calculate_ignore_before),
                           // `max_line_bytes` discards oversized lines
                           include: Seq[String] = Nil,
                           exclude: Seq[String] = Nil,
                           ignoreOlderSecs: Option[Long] = None,
                           maxLineBytes: Option[Int] = None) {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val mem = MemoryStream[(String, String, Long)]
  // per-source line sequence: real arrival order for downstream
  // order-sensitive transforms (line_agg, reduce) — streaming plans
  // can't synthesize one (monotonically_increasing_id is unsupported)
  private var seq = 0L

  /** fingerprint = CRC32 of the first `FpBytes` bytes (file.rs-style
    * head checksum). A file shorter than the window fingerprints over
    * what exists; its identity is kept stable across growth by
    * remembering, per path, the prefix length the fingerprint was
    * computed over — when the file grows, the old-prefix CRC still
    * matching proves it is the same file and the offsets entry migrates
    * to the new fingerprint (otherwise every append to a small file
    * would look like a brand-new file and re-emit from byte 0).
    */
  private val FpBytes = 256
  private def crcOfFirst(p: java.nio.file.Path, n: Int): Option[Long] = {
    try {
      val in = java.nio.file.Files.newInputStream(p)
      try {
        val head = in.readNBytes(n)
        if (head.isEmpty) None
        else {
          val crc = new java.util.zip.CRC32()
          crc.update(head)
          Some(crc.getValue)
        }
      } finally in.close()
    } catch { case _: java.io.IOException => None }
  }

  /** Resolve the stable fingerprint for `p` (size known), migrating a
    * shorter-prefix identity when the file has grown past it.
    */
  private def fingerprintOf(p: java.nio.file.Path, size: Long): Option[Long] = {
    val headLen = math.min(FpBytes.toLong, size).toInt
    crcOfFirst(p, headLen).map { fpNew =>
      val key = p.toString
      pathFp.get(key) match {
        case Some((len0, fp0)) if len0 == headLen && fp0 == fpNew => fpNew
        case Some((len0, fp0)) if len0 < headLen &&
            crcOfFirst(p, len0).contains(fp0) =>
          // same file, grown past the old window: carry the offset over
          offsets.remove(fp0).foreach { off =>
            offsets(fpNew) = math.max(offsets.getOrElse(fpNew, 0L), off)
          }
          pathFp(key) = (headLen, fpNew)
          fpNew
        case _ =>
          // new file at this path (fresh, rotated-in, or replaced)
          pathFp(key) = (headLen, fpNew)
          fpNew
      }
    }
  }

  // fingerprint -> committed byte offset (complete lines only)
  private val offsets = scala.collection.mutable.Map[Long, Long]()
  // path -> (prefix length, crc) its offsets entry is keyed on
  private val pathFp = scala.collection.mutable.Map[String, (Int, Long)]()
  loadCheckpoint()

  private def loadCheckpoint(): Unit = checkpoint.foreach { cp =>
    val p = java.nio.file.Paths.get(cp)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.readAllLines(p).forEach { line =>
        line.split("\t") match {
          case Array(fp, off) =>
            try offsets(fp.toLong) = off.toLong
            catch { case _: NumberFormatException => () }
          case Array("P", path, len, fp) =>
            try pathFp(path) = (len.toInt, fp.toLong)
            catch { case _: NumberFormatException => () }
          case _ => ()
        }
      }
    }
  }
  private def saveCheckpoint(): Unit = checkpoint.foreach { cp =>
    val body = (offsets.map { case (fp, off) => s"$fp\t$off" } ++
      pathFp.map { case (path, (len, fp)) => s"P\t$path\t$len\t$fp" })
      .mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(cp),
      body.getBytes("UTF-8"))
  }

  /** One tail pass over the directory: emit complete new lines from
    * every file, advance offsets, persist the checkpoint. Returns the
    * number of lines emitted.
    */
  def poll(): Int = {
    var emitted = 0
    val cpPath = checkpoint.map(c => java.nio.file.Paths.get(c).toAbsolutePath)
    val fs = java.nio.file.FileSystems.getDefault
    val includeMatchers = include.map(g =>
      fs.getPathMatcher("glob:" + java.nio.file.Paths.get(g)
        .getFileName.toString))
    val excludeMatchers = exclude.map(g =>
      fs.getPathMatcher("glob:" + java.nio.file.Paths.get(g)
        .getFileName.toString))
    val ignoreBefore = ignoreOlderSecs.map(s =>
      System.currentTimeMillis() - s * 1000)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p))
      // hidden files and our own checkpoint are not log files
      .filter(p => !p.getFileName.toString.startsWith(".") &&
        !cpPath.contains(p.toAbsolutePath))
      .filter(p => includeMatchers.isEmpty ||
        includeMatchers.exists(_.matches(p.getFileName)))
      .filter(p => !excludeMatchers.exists(_.matches(p.getFileName)))
      .filter(p => ignoreBefore.forall(cutoff =>
        java.nio.file.Files.getLastModifiedTime(p).toMillis >= cutoff))
      .sorted()
      .iterator()
    files.forEachRemaining { p =>
      val size = java.nio.file.Files.size(p)
      fingerprintOf(p, size).foreach { fp =>
        val committed = offsets.getOrElse(fp, 0L)
        // truncation (size shrank below the committed offset) restarts
        val from = if (size < committed) 0L else committed
        if (size > from) {
          val ch = java.nio.file.Files.newByteChannel(p)
          try {
            ch.position(from)
            val buf = java.nio.ByteBuffer.allocate((size - from).toInt)
            ch.read(buf)
            val bytes = buf.array()
            // hold back the partial last line (no trailing newline yet)
            val lastNl = bytes.lastIndexOf('\n'.toByte)
            if (lastNl >= 0) {
              val lines = new String(bytes, 0, lastNl, "UTF-8")
                .split("\n").filter(_.nonEmpty)
                // oversized lines are discarded, offset still advances
                // (file.rs max_line_bytes)
                .filter(l => maxLineBytes.forall(m =>
                  l.getBytes("UTF-8").length <= m))
              if (lines.nonEmpty)
                mem.addData(lines.toIndexedSeq.map { l =>
                  seq += 1
                  (p.toString, l, seq)
                })
              emitted += lines.length
              offsets(fp) = from + lastNl + 1
            }
          } finally ch.close()
        }
      }
    }
    saveCheckpoint()
    emitted
  }

  def df: DataFrame = mem.toDF().toDF("file", "message", "__seq")
}

object FileTail {
  def apply(spark: SparkSession, dir: String,
            checkpoint: Option[String] = None,
            include: Seq[String] = Nil,
            exclude: Seq[String] = Nil,
            ignoreOlderSecs: Option[Long] = None,
            maxLineBytes: Option[Int] = None): FileTailSource =
    new FileTailSource(spark, dir, checkpoint, include, exclude,
      ignoreOlderSecs, maxLineBytes)
}
