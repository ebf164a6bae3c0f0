package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `encoding.codec: parquet` on the object-store sink family
  * (encoding/format/parquet.rs — columnar export at the encoder edge):
  * objects are real parquet files a downstream reader opens natively.
  */
class ParquetObjectSpec extends SparkSpec {
  import spark.implicits._

  test("s3-shaped sink writes readable parquet objects per key prefix") {
    val base = java.nio.file.Files.createTempDirectory("pqobj").toString
    val df = Seq(
      (1L, "error", 0.5, "payload-a"),
      (2L, "error", 1.5, "payload-b"),
      (3L, "purchase", 2.5, "payload-c"))
      .toDF("event_id", "event_type", "value", "message")
      .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))
      .withColumn("tags", map(lit("k"), lit("v"))) // complex -> JSON col
    ObjectStoreSink.writeBatch(df.coalesce(1), ObjectStoreSink.Config(
      base, keyPrefix = "type={{ event_type }}/", codec = "parquet",
      filenameAppendUuid = false, fixedClockMs = Some(1709632800000L)))
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
      .toArray.map(_.toString).filter(_.endsWith(".parquet"))
    assert(files.length == 2, files.toSeq) // one per prefix
    assert(files.exists(_.contains("type=error/")))
    // a downstream reader opens the objects natively
    val back = spark.read.parquet(files: _*)
    assert(back.count() == 3)
    val r = back.orderBy("event_id").head()
    assert(r.getAs[Long]("event_id") == 1L)
    assert(r.getAs[String]("message") == "payload-a")
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant ==
      java.time.Instant.parse("2024-03-05T10:00:00Z"))
    assert(r.getAs[String]("tags") == """{"k":"v"}""")
    val errs = back.filter(col("event_type") === "error").count()
    assert(errs == 2)
  }

  test("arrow objects roundtrip through an IPC reader") {
    val base = java.nio.file.Files.createTempDirectory("arrowobj").toString
    val df = Seq((1L, "alpha", 0.5), (2L, "beta", 1.5))
      .toDF("id", "name", "score")
      .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))
    ObjectStoreSink.writeBatch(df.coalesce(1), ObjectStoreSink.Config(
      base, keyPrefix = "a/", codec = "arrow",
      filenameAppendUuid = false, fixedClockMs = Some(1709632800000L)))
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
      .toArray.map(_.toString).filter(_.endsWith(".arrow"))
    assert(files.length == 1, files.toSeq)
    // read back with the arrow IPC stream reader
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val in = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(files.head))
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
    try {
      assert(reader.loadNextBatch())
      val root = reader.getVectorSchemaRoot
      assert(root.getRowCount == 2)
      val ids = root.getVector("id")
        .asInstanceOf[org.apache.arrow.vector.BigIntVector]
      val names = root.getVector("name")
        .asInstanceOf[org.apache.arrow.vector.VarCharVector]
      assert(Seq(ids.get(0), ids.get(1)).sorted == Seq(1L, 2L))
      assert(new String(names.get(0), "UTF-8") == "alpha")
      val tsv = root.getVector("ts")
        .asInstanceOf[org.apache.arrow.vector.TimeStampMicroTZVector]
      assert(tsv.get(0) == 1709632800000000L)
    } finally { reader.close(); in.close(); alloc.close() }
  }

  test("max_events splits parquet objects") {
    val base = java.nio.file.Files.createTempDirectory("pqobj2").toString
    val df = (1 to 10).map(i => (i.toLong, s"m$i")).toDF("id", "m")
    ObjectStoreSink.writeBatch(df.coalesce(1), ObjectStoreSink.Config(
      base, keyPrefix = "all/", codec = "parquet", maxEvents = 4,
      filenameAppendUuid = false, fixedClockMs = Some(1709632800000L)))
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
      .toArray.map(_.toString).filter(_.endsWith(".parquet"))
    assert(files.length == 3) // 4+4+2
    assert(spark.read.parquet(files: _*).count() == 10)
  }
}
