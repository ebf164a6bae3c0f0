package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table helpers for the graft engine.
  *
  * The engine is batch-first for the oracle gate (every operator is a
  * plain DataFrame transformation so Catalyst optimizes across operator
  * boundaries) with a Structured Streaming runner layered on top (see
  * `graft.streaming`). Mirrors the reference's topology model
  * (sources -> transforms -> sinks, /root/reference/src/topology/) where a
  * "pipeline" is just a function DataFrame => DataFrame.
  */
object Graft {

  /** Local session tuned per the build guidance: shuffle partitions sized
    * to cores (not the 200 default), AQE on (runtime coalescing + skew
    * join handling — the local stand-in for what we'd rely on at 100 TB).
    */
  def session(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    // SPARK_GRAFT_MASTER overrides the master for multi-executor gate
    // runs (e.g. local-cluster[2,16,4096] forces REAL serialization of
    // broadcast codebooks, closures, and stateful kernels — the bug
    // class local[N] can't catch)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cores]")
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read one driver-provided parquet table from an sf directory.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for — read it as nanos-since-epoch (legacy conf) and convert to
    * a microsecond TIMESTAMP (integer DIV, not double division: epoch
    * nanos ~1.7e18 exceeds the 2^53 double mantissa).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/$name.parquet"
    val df = normalizeTs(spark.read.parquet(path))
    // Parallelism floor for tiny local fixtures: a single-row-group
    // parquet file scans as ONE task, so per-row-expensive pipelines
    // (regex decoders, from_json, crypto) would run effectively
    // single-threaded no matter the core count. At production scale the
    // scan splits across row groups/files and this branch never fires —
    // the shuffle it adds is ~the file size (bounded by the threshold).
    val bytes = try new java.io.File(path).length() catch { case _: Exception => Long.MaxValue }
    if (bytes > 0 && bytes < 64L * 1024 * 1024)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  /** Normalize an events-shaped frame's `ts` column to a UTC-instant
    * TIMESTAMP regardless of how the driver's parquet generation encoded
    * it. Two encodings have been observed across rounds:
    *  - TIMESTAMP(NANOS) read as nanos-since-epoch LongType via the legacy
    *    conf — convert with integer DIV (epoch nanos ~1.7e18 exceeds the
    *    2^53 double mantissa, so no double division);
    *  - timestamp[us] with isAdjustedToUTC=false, which Spark reads as
    *    TIMESTAMP_NTZ — every query (and the DuckDB oracle, which CASTs to
    *    plain TIMESTAMP) was written against UTC-instant semantics, so
    *    cast once here (session tz is UTC).
    * Shared by `table` and any streaming reader that scans events parquet
    * directly (streaming file sources can't go through `table`).
    */
  def normalizeTs(df0: DataFrame): DataFrame =
    df0.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df0.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df0.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df0
    }

  /** Single-field JSON long extraction, shared by the event queries —
    * kept behind one helper so the implementation is swappable in one
    * place. Measured on this box (3 fresh JVMs each, steady-state
    * best-of-3): get_json_object ~112 MiB/s through the remap shape vs
    * try_parse_json+try_variant_get ~81 — the single-path Jackson scan
    * beats a full variant parse when only one field is read. A variant
    * column would win if MANY fields were extracted from the same
    * parse (§1.5); for one field it does not.
    */
  def jsonLong(c: org.apache.spark.sql.Column, field: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    get_json_object(c, s"$$.$field").cast("long")
  }
}
