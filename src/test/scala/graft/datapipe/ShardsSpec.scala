package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")

  test("assign: every row gets a shard in range and a dense 1-based pos") {
    val a = Shards.assign(docs, col("doc_id"), 8)
    assert(a.count() == 200)
    assert(a.filter(col("shard") < 0 || col("shard") >= 8).count() == 0)
    // per shard, pos is exactly 1..count
    val bad = a.groupBy("shard")
      .agg(count("*").as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("d"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("assign is deterministic across runs and partitionings") {
    val a = Shards.assign(docs, col("doc_id"), 4)
      .select("doc_id", "shard", "pos").collect().toSet
    val b = Shards.assign(docs.repartition(7), col("doc_id"), 4)
      .select("doc_id", "shard", "pos").collect().toSet
    assert(a == b)
  }

  test("write: shard dirs round-trip with rows in md5 shuffle order") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Shards.write(docs, col("doc_id"), 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 200)
    assert(back.select("shard").distinct().count() == 4)
    // within one shard file, stored order == the md5 shuffle order
    val s0 = spark.read.parquet(s"$dir/shard=0")
      .select(col("doc_id")).as[Long].collect().toSeq
    val expected = Shards.assign(docs, col("doc_id"), 4)
      .filter(col("shard") === 0).orderBy("pos")
      .select("doc_id").as[Long].collect().toSeq
    assert(s0 == expected)
  }
}
