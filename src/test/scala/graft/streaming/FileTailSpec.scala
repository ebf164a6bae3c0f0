package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardOpenOption}

/** File tail source: append continuation, partial-line holdback,
  * rotation-by-rename (fingerprint keyed), checkpoint resume.
  */
class FileTailSpec extends SparkSpec {

  private def collected(q: org.apache.spark.sql.streaming.StreamingQuery,
                        name: String): Seq[String] = {
    q.processAllAvailable()
    spark.sql(s"SELECT message FROM $name").collect().map(_.getString(0)).toSeq
  }

  test("tail: a file shorter than the fingerprint window keeps its identity as it grows") {
    // head-CRC fingerprints change on every append while size < 256
    // bytes; the per-path prefix-length migration must carry the
    // committed offset over instead of re-emitting from byte 0
    val dir = Files.createTempDirectory("tailsmall")
    val log = dir.resolve("s.log")
    Files.write(log, "a\nb\n".getBytes("UTF-8"))
    val tail = FileTail(spark, dir.toString)
    val q = tail.df.writeStream.format("memory").queryName("tailsmall").start()
    try {
      tail.poll()
      assert(collected(q, "tailsmall").sorted == Seq("a", "b"))
      Files.write(log, "c\n".getBytes("UTF-8"), StandardOpenOption.APPEND)
      tail.poll()
      assert(collected(q, "tailsmall").sorted == Seq("a", "b", "c"))
      // grow straight past the 256-byte window in one append
      val big = (1 to 60).map(i => s"line$i").mkString("", "\n", "\n")
      Files.write(log, big.getBytes("UTF-8"), StandardOpenOption.APPEND)
      tail.poll()
      val all = collected(q, "tailsmall")
      assert(all.size == 63) // 3 + 60, nothing re-emitted
      assert(all.count(_ == "a") == 1)
    } finally q.stop()
  }

  test("tail: appends, partial lines, rotation, checkpoint resume") {
    val dir = Files.createTempDirectory("tail").toString
    val cp = s"$dir/.checkpoint"
    // fingerprints come from the first 256 bytes — make line one long
    // enough to be a distinctive head
    val pad = "x" * 300
    val f = Paths.get(s"$dir/app.log")

    val src = FileTail(spark, dir, Some(cp))
    val q = src.df.writeStream.format("memory").queryName("tail1").start()
    try {
      Files.writeString(f, s"first $pad\nsecond\npartial")
      assert(src.poll() == 2) // partial line held back
      assert(collected(q, "tail1") == Seq(s"first $pad", "second"))

      // finish the partial line + append another
      Files.writeString(f, " done\nthird\n", StandardOpenOption.APPEND)
      assert(src.poll() == 2)
      assert(collected(q, "tail1") ==
        Seq(s"first $pad", "second", "partial done", "third"))

      // rotate: rename, then a NEW file appears under the old name
      Files.move(f, Paths.get(s"$dir/app.log.1"))
      Files.writeString(Paths.get(s"$dir/app.log.1"), "post-rotate\n",
        StandardOpenOption.APPEND)
      Files.writeString(f, s"fresh $pad\nnew-file-line\n")
      val n = src.poll()
      // renamed file continues from its offset; fresh file reads from 0
      assert(n == 3)
      val all = collected(q, "tail1")
      assert(all.contains("post-rotate") && all.contains("new-file-line") &&
        all.contains(s"fresh $pad"))
      assert(all.count(_ == "second") == 1) // no re-emission after rename
      q.stop()

      // restart from the checkpoint: nothing re-emitted
      val src2 = FileTail(spark, dir, Some(cp))
      val q2 = src2.df.writeStream.format("memory").queryName("tail2").start()
      try {
        assert(src2.poll() == 0)
        Files.writeString(f, "after-restart\n", StandardOpenOption.APPEND)
        assert(src2.poll() == 1)
        assert(collected(q2, "tail2") == Seq("after-restart"))
      } finally q2.stop()
    } finally if (q.isActive) q.stop()
  }

  test("include/exclude globs, ignore_older_secs, max_line_bytes") {
    val dir = Files.createTempDirectory("tailopts")
    Files.write(dir.resolve("app.log"),
      ("keep me\n" + "x" * 100 + "\n").getBytes("UTF-8"))
    Files.write(dir.resolve("app.tmp"), "wrong ext\n".getBytes("UTF-8"))
    Files.write(dir.resolve("noise.log"), "excluded\n".getBytes("UTF-8"))
    val old = dir.resolve("old.log")
    Files.write(old, "too old\n".getBytes("UTF-8"))
    Files.setLastModifiedTime(old, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 7200 * 1000))
    val tail = FileTail(spark, dir.toString,
      include = Seq("*.log"), exclude = Seq("noise.*"),
      ignoreOlderSecs = Some(3600), maxLineBytes = Some(50))
    val q = tail.df.writeStream.format("memory").queryName("tailopts").start()
    try {
      tail.poll()
      // only app.log's short line survives every filter
      assert(collected(q, "tailopts") == Seq("keep me"))
    } finally q.stop()
  }
}
