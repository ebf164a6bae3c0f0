package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Five strategies, all pure DataFrame pipelines (shuffle-conscious —
  * the 100 TB path is the LSH band join, never an all-pairs product):
  *
  *  - exact: hash-groupBy on normalized text; one shuffle on the hash.
  *  - MinHash+LSH: shingle -> K minhashes -> B bands; docs sharing a band
  *    bucket are candidates (join only within buckets), then exact
  *    Jaccard verifies. Tunable (B, R) trades recall vs candidate count.
  *  - SimHash: 32-bit bitwise-majority fingerprint per doc; near-dups
  *    share fingerprint (or a band of it) — one narrow agg + equi-join.
  *  - n-gram Jaccard: exact pairwise Jaccard but blocked by an inverted
  *    shingle index so only pairs sharing >=1 shingle are scored.
  *  - embedding cosine: see [[Ann]]; near-dup = cosine above threshold.
  *
  * Hashes are md5-derived (not xxhash64) so every stage is reproducible
  * in any engine — the cross-engine oracle recomputes the exact same
  * signatures.
  */
object Dedup {

  /** Whitespace tokens, empty-trimmed. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Word n-gram shingles; short docs collapse to one whole-doc shingle. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Exact dedupe: group by content hash, keep lowest id. */
  def exact(docs: DataFrame, id: String, text: Column): DataFrame = {
    val hashed = docs.withColumn("__h", md5(text))
    val w = Window.partitionBy(col("__h")).orderBy(col(id))
    hashed.withColumn("__rn", row_number().over(w))
      .withColumn("dup_of", first(col(id)).over(
        Window.partitionBy(col("__h")).orderBy(col(id))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__rn") > 1) // report the duplicates
      .drop("__h", "__rn")
  }

  /** Portable MinHash signature: sig[i] = min over shingles of
    * md5(i || "|" || shingle) — lexicographic min over hex strings.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(sh,
        s => md5(concat(h.cast("string"), lit("|"), s)))))

  /** LSH band keys: band b = md5(sig[b*rows .. b*rows+rows-1] joined). */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("", slice(sig, b * rows + 1, lit(rows)))))

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    * Returns (id_a, id_b, jaccard) for candidate pairs with
    * jaccard >= threshold, id_a < id_b.
    */
  def minhashLsh(docs: DataFrame, id: String, text: Column,
                 shingleN: Int = 3, numHashes: Int = 12, bands: Int = 3,
                 threshold: Double = 0.5): DataFrame = {
    // signature table is used by BOTH sides of the band self-join —
    // persist it or the 12×|shingles| md5 pipeline runs 2+ times (the
    // 100 TB version checkpoints signatures to parquet for the same
    // reason)
    val withSh = docs.select(col(id).as("doc"), shingles(text, shingleN).as("sh"))
      .persist()
    val banded = withSh
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("doc"),
        posexplode(lshBands(col("sig"), bands, numHashes / bands))
          .as(Seq("band_idx", "band_hash")))
      .persist()
    // candidates: docs sharing any (band_idx, band_hash) bucket
    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
    verifyJaccard(candidates, distinctShingles(withSh), threshold)
  }

  /** Blocked exact n-gram Jaccard: pairs sharing >= 1 shingle, scored. */
  def ngramJaccard(docs: DataFrame, id: String, text: Column,
                   shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val withSh = docs.select(col(id).as("doc"), shingles(text, shingleN).as("sh"))
    val inv = distinctShingles(withSh)
    val candidates = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
    verifyJaccard(candidates, inv, threshold)
  }

  /** Persisted inverted index (doc, shingle) — reused across the
    * candidate self-join and the verification joins.
    */
  private def distinctShingles(withSh: DataFrame): DataFrame =
    withSh.select(col("doc"), explode(array_distinct(col("sh"))).as("s"))
      .persist()

  /** Exact Jaccard over distinct shingle sets for given candidate pairs. */
  private def verifyJaccard(candidates: DataFrame, inv: DataFrame,
                            threshold: Double): DataFrame = {
    val sizes = inv.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val common = candidates
      .join(inv.as("sa"), col("sa.doc") === col("id_a"))
      .join(inv.as("sb"),
        col("sb.doc") === col("id_b") && col("sa.s") === col("sb.s"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.as("za"), col("za.doc") === col("id_a"))
      .join(sizes.as("zb"), col("zb.doc") === col("id_b"))
      .withColumn("jaccard",
        round(col("n_common") /
          (col("za.n_sh") + col("zb.n_sh") - col("n_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash: 32-bit bitwise-majority fingerprint over token hashes.
    * Token hash = first 8 md5 hex chars as uint32 (engine-portable).
    * One explode + one groupBy — linear, no pairwise work.
    */
  def simhash(docs: DataFrame, id: String, text: Column): DataFrame = {
    val tok = docs.select(col(id).as("doc"), explode(tokens(text)).as("t"))
      .withColumn("h", conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long"))
    val bitAggs = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    tok.groupBy(col("doc"))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .withColumn("simhash",
        (0 until 32).map(b =>
          when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
          .reduce(_ + _))
      .select(col("doc"), col("simhash"))
  }

  /** Hamming-near pairs on simhash fingerprints (block by 8-bit bands:
    * near pairs share >= 1 of 4 bands when hamming distance is small).
    */
  def simhashPairs(fingerprints: DataFrame, maxHamming: Int = 3): DataFrame = {
    val banded = fingerprints.select(col("doc"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 8).bitwiseAND(lit(0xFFL))): _*))
        .as(Seq("band_idx", "band_val")))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
    cands.withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
