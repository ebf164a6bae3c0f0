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
                           checkpoint: Option[String] = None) {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val mem = MemoryStream[(String, String)]

  /** fingerprint = CRC32 of the first `FpBytes` bytes (file.rs-style
    * head checksum; files shorter than the window use what exists,
    * which means very short fresh files can collide until they grow —
    * same caveat the reference documents).
    */
  private val FpBytes = 256
  private def fingerprintOf(p: java.nio.file.Path): Option[Long] = {
    try {
      val in = java.nio.file.Files.newInputStream(p)
      try {
        val head = in.readNBytes(FpBytes)
        if (head.isEmpty) None
        else {
          val crc = new java.util.zip.CRC32()
          crc.update(head)
          Some(crc.getValue)
        }
      } finally in.close()
    } catch { case _: java.io.IOException => None }
  }

  // fingerprint -> committed byte offset (complete lines only)
  private val offsets = scala.collection.mutable.Map[Long, Long]()
  loadCheckpoint()

  private def loadCheckpoint(): Unit = checkpoint.foreach { cp =>
    val p = java.nio.file.Paths.get(cp)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.readAllLines(p).forEach { line =>
        line.split("\t") match {
          case Array(fp, off) =>
            try offsets(fp.toLong) = off.toLong
            catch { case _: NumberFormatException => () }
          case _ => ()
        }
      }
    }
  }
  private def saveCheckpoint(): Unit = checkpoint.foreach { cp =>
    val body = offsets.map { case (fp, off) => s"$fp\t$off" }.mkString("\n")
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
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p))
      // hidden files and our own checkpoint are not log files
      .filter(p => !p.getFileName.toString.startsWith(".") &&
        !cpPath.contains(p.toAbsolutePath))
      .sorted()
      .iterator()
    files.forEachRemaining { p =>
      fingerprintOf(p).foreach { fp =>
        val size = java.nio.file.Files.size(p)
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
              if (lines.nonEmpty)
                mem.addData(lines.toIndexedSeq.map(l => (p.toString, l)))
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

  def df: DataFrame = mem.toDF().toDF("file", "message")
}

object FileTail {
  def apply(spark: SparkSession, dir: String,
            checkpoint: Option[String] = None): FileTailSource =
    new FileTailSource(spark, dir, checkpoint)
}
