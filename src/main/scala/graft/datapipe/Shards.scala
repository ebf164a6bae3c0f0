package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-output sharding: the last step of a curation pipeline is a
  * GLOBAL deterministic shuffle of the corpus into N equal-ish shard
  * files, so that sequential readers see a well-mixed stream and reruns
  * produce byte-identical shards (no Math.random, no partition-index
  * dependence — md5 of the document key drives both the shard choice and
  * the within-shard order).
  *
  * Scale shape: shard assignment is a pure projection; materializing
  * shards is ONE hash shuffle on shard id followed by a within-partition
  * sort — exactly the repartition+sort pattern a distributed sorted
  * write needs, no global sort, no driver state. Position numbering uses
  * a per-shard window over the same partitioning, so it reuses the
  * shuffle rather than adding one.
  */
object Shards {

  /** 24-bit md5-prefix bucket of the key, mod n — engine-portable
    * (DuckDB: `CAST(substr(md5(k),1,6) AS ...)` hex-parse) and
    * uniform enough for shard balance at any corpus size.
    */
  def shardId(key: Column, n: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 6), 16, 10)
      .cast("long"), lit(n))

  /** The global shuffle order within a shard: full md5 of the key, with
    * the key itself as tiebreak so equal hashes stay deterministic.
    */
  def shuffleOrder(key: Column): Seq[Column] =
    Seq(md5(key.cast("string")), key.cast("string"))

  /** Assign (shard, pos) to every row: shard = hashed bucket, pos =
    * 1-based position in the shard's deterministic shuffle order.
    */
  def assign(df: DataFrame, key: Column, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardId(key, n))
      .orderBy(shuffleOrder(key): _*)
    df.withColumn("shard", shardId(key, n))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Materialize the shards under `dir` as parquet, one directory per
    * shard (`shard=K/`), rows in shuffle order within each file. The
    * repartition keys on the shard column so each shard is written by
    * one task (shards are sized to be many per executor; skew across
    * shards is bounded by the md5 uniformity).
    */
  def write(df: DataFrame, key: Column, n: Int, dir: String): Unit =
    df.withColumn("shard", shardId(key, n))
      .withColumn("__ord", md5(key.cast("string")))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"), key.cast("string"))
      .drop("__ord")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
}
