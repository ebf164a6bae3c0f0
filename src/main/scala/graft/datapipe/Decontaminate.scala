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
    *
    * COLLISION SEMANTICS: the probe compares 64-bit gram hashes, so a
    * corpus gram colliding with any benchmark gram hash flags a clean
    * doc — a FALSE POSITIVE only (a true overlap always hash-hits, so
    * there are no false negatives and "clean" is always trustworthy).
    * At sf scale the expected collision count is ~0; at 10^12 corpus
    * grams x 10^8 benchmark grams it is nonzero, and the direction is
    * conservative (drops a clean doc). For audit-grade runs pass
    * `exactConfirm = true`: flagged docs (tiny by construction) get a
    * second pass comparing the gram STRINGS, and hash-only flags are
    * cleared. The confirm broadcasts only the flagged docs' grams and
    * streams the benchmark side, so it stays scale-safe (it does pay
    * two extra corpus scans — the audit-grade trade).
    */
  def overlap(docs: DataFrame, idCol: String, text: Column,
              benchmark: DataFrame, benchText: Column, n: Int = 8,
              maxHitRatio: Double = 0.0,
              exactConfirm: Boolean = false): DataFrame =
    overlapImpl(docs, idCol, text, benchmark, benchText, n, maxHitRatio,
      exactConfirm, gramHash = xxhash64(_))

  /** Implementation with an injectable gram hash so tests can force
    * collisions (e.g. a constant hash collides everything) and assert
    * the exact-confirm pass rescues clean docs.
    */
  private[datapipe] def overlapImpl(docs: DataFrame, idCol: String,
                                    text: Column, benchmark: DataFrame,
                                    benchText: Column, n: Int,
                                    maxHitRatio: Double,
                                    exactConfirm: Boolean,
                                    gramHash: Column => Column): DataFrame = {
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
          transform(Dedup.shinglesOfToks(col("t"), n), s => gramHash(s))))
          .as("g"))
    val benchGrams = benchmark
      .select(Dedup.tokens(benchText).as("t"))
      .select(explode(
        transform(Dedup.shinglesOfToks(col("t"), n), s => gramHash(s))).as("g"))
      .distinct()
    val hashed = grams
      .join(broadcast(benchGrams.withColumn("__hit", lit(1))), Seq("g"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hit"))
      .withColumn("hit_ratio",
        round(col("n_hit").cast("double") / col("n_grams"), 4))
      .withColumn("contaminated",
        (col("hit_ratio") > maxHitRatio).cast("int"))
    if (!exactConfirm) hashed
    else {
      // Second pass over FLAGGED docs only, comparing gram strings.
      // Flagged docs are tiny by construction (that is the point of
      // decontamination), so their distinct grams broadcast and the
      // benchmark side streams map-side — no corpus re-shuffle.
      val flaggedIds = hashed.filter(col("contaminated") === 1)
        .select(col("doc"))
      // persisted: both the hit recount and the denominator recount
      // below read this frame — without the persist the corpus re-scan
      // behind it would run twice
      val flaggedGrams = docs
        .join(flaggedIds.withColumnRenamed("doc", idCol), Seq(idCol))
        .select(col(idCol).as("doc"), Dedup.tokens(text).as("t"))
        .select(col("doc"),
          explode(array_distinct(Dedup.shinglesOfToks(col("t"), n)))
            .as("gs"))
        .persist()
      val benchStr = benchmark
        .select(Dedup.tokens(benchText).as("t"))
        .select(explode(Dedup.shinglesOfToks(col("t"), n)).as("gs"))
        .distinct()
      val exactHits = benchStr
        .join(broadcast(flaggedGrams), Seq("gs"))
        .groupBy(col("doc"))
        .agg(count(lit(1)).as("__n_hit_exact"))
      // The denominator must be recounted too: the first pass counted
      // DISTINCT HASHES, so an intra-doc gram collision undercounts it
      // and the recomputed ratio could exceed the true ratio (even > 1
      // in the degenerate all-collide case). The flagged docs' distinct
      // gram STRINGS are already materialized — one tiny extra agg.
      val flaggedN = flaggedGrams.groupBy(col("doc"))
        .agg(count(lit(1)).as("__n_grams_exact"))
      hashed.join(exactHits, Seq("doc"), "left")
        .join(flaggedN, Seq("doc"), "left")
        .withColumn("n_hit",
          when(col("contaminated") === 1,
            coalesce(col("__n_hit_exact"), lit(0L)))
            .otherwise(col("n_hit")))
        .withColumn("n_grams",
          when(col("contaminated") === 1,
            coalesce(col("__n_grams_exact"), col("n_grams")))
            .otherwise(col("n_grams")))
        .withColumn("hit_ratio",
          round(col("n_hit").cast("double") / col("n_grams"), 4))
        .withColumn("contaminated",
          (col("hit_ratio") > maxHitRatio).cast("int"))
        .drop("__n_hit_exact", "__n_grams_exact")
    }
  }

  /** The drop step: keep only clean docs, annotated with the overlap
    * stats (a real pipeline keeps the stats column for audit).
    */
  def clean(docs: DataFrame, idCol: String, text: Column,
            benchmark: DataFrame, benchText: Column, n: Int = 8,
            maxHitRatio: Double = 0.0,
            exactConfirm: Boolean = false): DataFrame = {
    val flags = overlap(docs, idCol, text, benchmark, benchText, n,
      maxHitRatio, exactConfirm)
    docs.join(flags.filter(col("contaminated") === 0)
        .select(col("doc").as(idCol), col("n_grams"), col("n_hit")),
      Seq(idCol))
  }
}
