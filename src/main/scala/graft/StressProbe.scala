package graft

import org.apache.spark.sql.functions._

/** One-off scaling sanity for the session's new ops at 40× sf0.1
  * (~200k docs, text-mutated so dedup/caches can't collapse the
  * replicas) — the same harness BENCH_NOTES_r09.md's round-9 op stress
  * used. Prints one line per op; not part of the driver contract.
  */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val rep = sys.env.getOrElse("SPARK_GRAFT_STRESS_REP", "40").toInt
    val docs = Graft.table(spark, sfDir, "documents")
      .withColumn("__r", explode(sequence(lit(0), lit(rep - 1))))
      .withColumn("doc_id", col("doc_id") * rep + col("__r"))
      .withColumn("text",
        concat(col("text"), lit(" v"), pmod(col("__r"), lit(97))))
      .drop("__r")
      .cache()
    val n = docs.count()
    println(s"corpus: $n docs")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.1f s  ($out rows)")
    }

    timed("bpe_train_200") {
      graft.datapipe.Bpe.train(docs, col("text"), numMerges = 200)
        .merges.length.toLong
    }
    val model = graft.datapipe.Bpe.train(docs, col("text"), numMerges = 200)
    timed("bpe_encode") {
      docs.select(size(graft.datapipe.Bpe.encodeCol(model, col("text")))
        .as("n")).agg(sum("n")).head().getLong(0)
    }
    timed("chunk_500_100") {
      docs.select(posexplode(graft.datapipe.TextAnalysis.chunks(
        col("text"), 500, 100))).count()
    }
    timed("json_schema_validate") {
      val schema = """{"type":"object","required":["k"],
        |"properties":{"k":{"type":"integer"}}}""".stripMargin
      val j = concat(lit("{\"k\": "), pmod(col("doc_id"), lit(100)), lit("}"))
      docs.select(graft.functions.Vrl.validateJsonSchema(j, schema, false)
        .as("ok")).filter(col("ok")).count()
    }

    // ---- round-10 ops ----

    timed("bloom_build_64k") {
      // distributed build: one explode+distinct pass bounded by m bits
      graft.enrich.MemoryFilters.bloomTable(
        docs.select(pmod(col("doc_id"), lit(60000L)).cast("string").as("k")),
        col("k"), maxEntries = 65536).words.length.toLong
    }
    val bloom = graft.enrich.MemoryFilters.bloomTable(
      docs.select(pmod(col("doc_id"), lit(60000L)).cast("string").as("k")),
      col("k"), maxEntries = 65536)
    timed("bloom_probe") {
      // shuffle-free projection over the whole corpus
      docs.select(graft.enrich.MemoryFilters.bloomMember(
          col("doc_id").cast("string"), bloom).as("m"))
        .filter(col("m")).count()
    }
    val cuckoo = graft.enrich.MemoryFilters.cuckooTable(
      docs.select(pmod(col("doc_id"), lit(3000L)).cast("string").as("k"),
        col("doc_id")),
      col("k"), col("doc_id"), maxEntries = 4096)
    timed("cuckoo_probe") {
      // broadcast (bucket, fp) join over the whole corpus
      graft.enrich.MemoryFilters.cuckooMember(
          docs, col("doc_id").cast("string"), cuckoo)
        .filter(col("member")).count()
    }
    timed("sample_dynamic") {
      // per-event rate draw — pure filter
      graft.operators.Sample.dynamic(
        docs.withColumn("rt", pmod(col("doc_id"), lit(20L)) + 1),
        col("doc_id"), None, Some("rt"), staticRate = 10).count()
    }
    spark.stop()
  }
}
