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

  /** Join-strategy thresholds, overridable per deployment (a 100 TB
    * operator wants these as knobs, not recompiles):
    *  - `DefaultHintRows`: bounded-side row count above which the
    *    [[connectedComponents]] per-round joins pin `shuffle_hash`
    *    instead of letting AQE pick (~10 MB of (long,long) rows —
    *    past any sane broadcast threshold).
    *  - `DefaultIndexHintRows`: shingle-index row count above which
    *    the LSH/Jaccard verify joins pin `shuffle_hash` to stream the
    *    index unsorted (sort-merge re-sorting a billion-row index was
    *    the measured 375 GB-of-spill failure on the 10M-doc cluster
    *    run). Callers that know their scale pass `fatIndex` and skip
    *    the auto count entirely.
    */
  val DefaultHintRows = 300000L
  val DefaultIndexHintRows = 50000000L

  /** Edge-count cap for [[connectedComponents]]' driver union-find fast
    * path (~16 MB of (long, long) pairs at the default — well inside any
    * sane driver). Deployment knob, same spirit as the hint rows above;
    * 0 disables the fast path entirely.
    */
  val DefaultDriverEdges = 500000

  /** Planner-estimated corpus row count above which [[ngramJaccardAuto]]
    * picks the prefix-filtered PPJoin form over the direct pair-count
    * join. The direct join emits one row per co-occurring (pair,
    * shingle) — df² rows per hot shingle — so its cost is bounded only
    * while shingle doc-frequencies stay modest, which empirically holds
    * for small corpora and degrades with corpus size (boilerplate
    * shingles accumulate df linearly with N). The prefix variant pays
    * two extra narrow joins for immunity to df skew — the right trade
    * past a few million docs. Deployment knob, same spirit as the hint
    * rows; both branches are exact, so an estimate miss costs plan
    * quality, never rows.
    */
  val DefaultNgramPrefixRows = 2000000L

  /** Planner-estimated corpus row count above which drop-set anti-joins
    * pin `shuffle_hash` instead of trusting AQE's broadcast conversion:
    * drop sets have CORPUS cardinality in the worst case, Catalyst's
    * aggregate size estimate undershoots them, and the resulting
    * driver-side broadcast builds are what OOM'd the r15 8 GB-driver
    * curation run (two concurrent AQE broadcast-stage builds of
    * corpus-cardinality id sets). Statistics-derived — no knob needed.
    */
  val FatCorpusRows = 5000000L

  /** Drop-set anti-join with a statistics-derived strategy (no job):
    * below [[FatCorpusRows]] the drop side broadcasts (AQE's call, the
    * right plan at small scale); above it, pin `shuffle_hash` on the
    * drop side so the build is a per-task hash map over an ordinary
    * exchange and the driver never materializes a corpus-cardinality
    * broadcast. Strategy only — same rows out.
    */
  def dropAnti(docs: DataFrame, drop: DataFrame, key: String): DataFrame =
    dropAnti(docs, drop, key, estimatedRows(docs) > FatCorpusRows)

  /** Chained form: callers stacking several drop sets on one corpus
    * evaluate the fat decision ONCE on the corpus frame and pass it
    * through, instead of re-optimizing a growing plan per stage just
    * to re-read the same statistic.
    */
  def dropAnti(docs: DataFrame, drop: DataFrame, key: String,
               fat: Boolean): DataFrame = {
    val d = if (fat) drop.hint("shuffle_hash") else drop
    docs.join(d, Seq(key), "left_anti")
  }

  /** Whitespace tokens, empty-trimmed. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Word n-gram shingles; short docs collapse to one whole-doc shingle.
    *
    * IMPORTANT: `toks` must be a bound column (materialized in a prior
    * projection), NOT an inline `tokens(text)` expression — the transform
    * lambda body re-evaluates its free expressions per ELEMENT, so an
    * inline split would re-tokenize the document once per shingle
    * (observed 6× slowdown on the dedup pipelines).
    */
  def shinglesOfToks(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array(concat_ws(" ", toks)))

  def shingles(text: Column, n: Int = 3): Column = shinglesOfToks(tokens(text), n)

  /** (doc, distinct shingle string) rows — the shared first stage of the
    * shingle-based dedup pipelines, tokenizing exactly once per doc.
    */
  def shingleRows(docs: DataFrame, id: String, text: Column,
                  n: Int): DataFrame =
    docs.select(col(id).as("doc"), tokens(text).as("toks"))
      .select(col("doc"),
        explode(array_distinct(shinglesOfToks(col("toks"), n))).as("s0"))

  /** Narrow exact-dedup core: (id, dup_of) for every non-canonical
    * copy. The window shuffle carries only (id, 16-byte md5) — the text
    * column is consumed map-side by the digest and never enters the
    * exchange (the r15 form windowed the full row, shuffling the corpus
    * text once per exact-dedup stage). Survivor filters and drop sets
    * need exactly this frame; [[exact]] re-attaches the caller's
    * columns for report-style output.
    */
  def exactDups(docs: DataFrame, id: String, text: Column): DataFrame = {
    val hashed = docs.select(col(id), md5(text).as("__h"))
    val w = Window.partitionBy(col("__h")).orderBy(col(id))
    hashed.withColumn("__rn", row_number().over(w))
      .withColumn("dup_of", first(col(id)).over(
        Window.partitionBy(col("__h")).orderBy(col(id))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__rn") > 1) // report the duplicates
      .select(col(id), col("dup_of"))
  }

  /** Exact dedupe: group by content hash, keep lowest id. Returns the
    * duplicate rows with all their original columns plus `dup_of`.
    */
  def exact(docs: DataFrame, id: String, text: Column): DataFrame =
    docs.join(exactDups(docs, id, text), Seq(id))

  /** Portable MinHash via Carter-Wegman mixing: per shingle ONE md5 gives
    * two 32-bit lanes (hex chars 1-8 and 9-16; the second forced odd),
    * and hash family i is `(h1 + i*h2) mod 2^32` — cheap integer
    * arithmetic any engine reproduces exactly, instead of K independent
    * digests per shingle. sig[i] = min over shingles.
    */
  def minhashLanes(s: Column): (Column, Column) = {
    val hx = md5(s)
    val h1 = conv(substring(hx, 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(hx, 9, 8), 16, 10).cast("long").bitwiseOR(lit(1L))
    (h1, h2)
  }

  private val M32 = 4294967296L // 2^32

  /** Per-row array form of the signature (API parity; bulk path below). */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), h =>
      array_min(transform(sh, s => {
        val (h1, h2) = minhashLanes(s)
        pmod(h1 + h * h2, lit(M32))
      })))

  /** Bulk MinHash: explode shingles to rows so the md5 + K mixes and the
    * per-doc mins all run in whole-stage codegen with map-side partial
    * aggregation — the shuffle carries only ~K mins per (doc, partition),
    * never the shingle stream.
    */
  def minhashSignatures(withSh: DataFrame, numHashes: Int): DataFrame = {
    val ex = withSh.select(col("doc"), explode(col("sh")).as("s"))
    val (l1, l2) = minhashLanes(col("s"))
    val lanes = ex.select(col("doc"), l1.as("h1"), l2.as("h2"))
    val mins = (0 until numHashes).map(h =>
      min(pmod(col("h1") + lit(h.toLong) * col("h2"), lit(M32))).as(s"m$h"))
    lanes.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
      .select(col("doc"),
        array((0 until numHashes).map(h => col(s"m$h")): _*).as("sig"))
  }

  /** LSH band keys: band b = sig[b*rows .. b*rows+rows-1] joined with
    * "," — the bucket id IS the value tuple (hashing it again adds
    * nothing and would cost a digest per doc per band).
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => array_join(
        transform(slice(sig, b * rows + 1, lit(rows)), v => v.cast("string")),
        ","))

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    * Returns (id_a, id_b, jaccard) for candidate pairs with
    * jaccard >= threshold, id_a < id_b.
    *
    * One persisted intermediate: the NARROW per-(doc, distinct-shingle)
    * row of three longs — never the shingle strings or signature arrays
    * (caching fat string arrays costs more than recomputing them; the
    * 100 TB version checkpoints this same narrow index to parquet).
    * Signatures over distinct shingles equal signatures over the raw
    * stream (min is idempotent).
    */
  /** `maxBucket` (0 = unbounded, the default — output unchanged) caps
    * the candidate fan-out of HOT LSH buckets: a degenerate bucket —
    * boilerplate, empty docs, a template repeated across millions of
    * pages — makes the band self-join O(|bucket|²) and is the one
    * input shape that kills this operator at corpus scale. With the
    * cap, each (band, hash) bucket contributes pairs only among its
    * first `maxBucket` members (deterministic: lowest doc ids), so
    * per-bucket work is bounded by maxBucket² while every doc still
    * competes in its OTHER bands. Best-effort recall inside capped
    * buckets (members beyond the cap can still reach the cluster
    * transitively via kept members and connected components) — the
    * same bounded posture as [[Ann.semanticDedupBounded]].
    *
    * `maxBucket < 0` picks `max(50, ⌈√N⌉)` automatically (one count
    * over the input, opt-in): per-bucket pair work is then bounded by
    * N, so total candidate fan-out stays O(N·bands) even on a corpus
    * that is one giant boilerplate bucket — the [[Ann
    * .semanticDedupBounded]] auto-maxCell precedent. Default stays 0
    * (unbounded, byte-identical output).
    */
  def minhashLsh(docs: DataFrame, id: String, text: Column,
                 shingleN: Int = 3, numHashes: Int = 12, bands: Int = 3,
                 threshold: Double = 0.5, maxBucket: Int = 0,
                 fatIndex: Option[Boolean] = None): DataFrame = {
    val (idx, candidates) =
      lshCandidates(docs, id, text, shingleN, numHashes, bands, maxBucket)
    verifyJaccard(candidates, idx.select(col("doc"), col("s")), threshold,
      fatIndex)
  }

  /** Shared LSH front half: the persisted narrow shingle index and the
    * distinct band-bucket candidate pairs (see [[minhashLsh]] for the
    * knob semantics). Both returned frames are lazy; `idx` is persisted.
    */
  private def lshCandidates(docs: DataFrame, id: String, text: Column,
                            shingleN: Int, numHashes: Int, bands: Int,
                            maxBucket: Int): (DataFrame, DataFrame) = {
    val cap =
      if (maxBucket >= 0) maxBucket
      else math.max(50L,
        math.ceil(math.sqrt(docs.count().toDouble)).toLong).toInt
    val idx = {
      val ex = shingleRows(docs, id, text, shingleN)
      val (h1, h2) = minhashLanes(col("s0"))
      ex.select(col("doc"), xxhash64(col("s0")).as("s"),
        h1.as("h1"), h2.as("h2"))
    }.persist()
    val mins = (0 until numHashes).map(h =>
      min(pmod(col("h1") + lit(h.toLong) * col("h2"), lit(M32))).as(s"m$h"))
    val sig = idx.groupBy(col("doc"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc"),
        array((0 until numHashes).map(h => col(s"m$h")): _*).as("sig"))
    val bandedAll = sig
      .select(col("doc"),
        posexplode(lshBands(col("sig"), bands, numHashes / bands))
          .as(Seq("band_idx", "band_hash")))
    val banded = (if (cap > 0) {
        val byBucket = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_hash"))
          .orderBy(col("doc"))
        bandedAll
          .withColumn("__rk", row_number().over(byBucket))
          .filter(col("__rk") <= cap)
          .drop("__rk")
      } else bandedAll)
      .persist()
    // candidates: docs sharing any (band_idx, band_hash) bucket
    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
    (idx, candidates)
  }

  /** DISK-BOUNDED [[minhashLsh]]: identical pairs out, but the exact-
    * Jaccard verify runs in `slices` deterministic hash slices of the
    * candidate set, each slice its own action landing on `sliceDir`
    * parquet, with that slice's shuffle files released — synchronously,
    * via [[org.apache.spark.GraftShuffleCleanup]] — before the next
    * slice starts, so peak LIVE shuffle disk is bounded by one slice.
    * The front half (shingle index, banded signatures, and — since r18 —
    * the band-join candidate pairs) is built ONCE and staged on zstd
    * parquet, not held as caches: the 40M-doc attempt showed the
    * MEMORY_AND_DISK form can fill a container before any verify slice
    * starts, while the parquet form releases its build shuffles as each
    * table lands and gives every slice REAL file statistics.
    *
    * Each verify slice pre-filters the index with a broadcast Bloom
    * filter over the slice's candidate doc-id hashes (guide §3.2): only
    * index rows of docs participating in this slice's pairs enter the
    * verify joins' exchanges, instead of the full ~shingles x corpus
    * index per slice — the r17 40M rung died on exactly that full
    * re-shuffle. Filtering is per-doc all-or-nothing with no false
    * negatives, so pair verification and the per-doc size denominators
    * are exact; false positives only add shuffle bytes. The staged
    * tables are deleted when the last slice lands; only `pairs/`
    * remains. Returns the union read back from `sliceDir/pairs`
    * (already materialized — callers that would re-verify per
    * downstream action get that for free).
    */
  def minhashLshSliced(docs: DataFrame, id: String, text: Column,
                       sliceDir: String, slices: Int,
                       shingleN: Int = 3, numHashes: Int = 12,
                       bands: Int = 3, threshold: Double = 0.5,
                       maxBucket: Int = 0,
                       fatIndex: Option[Boolean] = None): DataFrame = {
    require(slices >= 1, s"minhashLshSliced: slices must be >= 1, got $slices")
    val spark = docs.sparkSession
    val sc = spark.sparkContext
    // Deterministic shuffle release between staged actions: each stage's
    // output is on parquet, so its shuffle files are dead the moment the
    // write returns — release them SYNCHRONOUSLY instead of hoping a GC
    // cycle reaches the ContextCleaner in time (the r17 form's
    // System.gc() is best-effort; on a busy heap slice files outlived
    // their slice and the disk bound quietly failed).
    def staged[T](body: => T): T = {
      val before = org.apache.spark.GraftShuffleCleanup.liveShuffleIds(sc)
      val out = body
      val created =
        org.apache.spark.GraftShuffleCleanup.liveShuffleIds(sc) -- before
      org.apache.spark.GraftShuffleCleanup.release(sc, created)
      out
    }
    val cap =
      if (maxBucket >= 0) maxBucket
      else math.max(50L,
        math.ceil(math.sqrt(docs.count().toDouble)).toLong).toInt
    // stage 1: the narrow shingle index (same projection as
    // lshCandidates' persisted idx, landed on parquet instead)
    staged {
      val ex = shingleRows(docs, id, text, shingleN)
      val (h1, h2) = minhashLanes(col("s0"))
      ex.select(col("doc"), xxhash64(col("s0")).as("s"),
          h1.as("h1"), h2.as("h2"))
        .write.mode("overwrite").parquet(s"$sliceDir/idx")
    }
    val idx = spark.read.parquet(s"$sliceDir/idx")
    // stage 2: banded bucket rows (signatures + optional hot-bucket cap)
    staged {
      val mins = (0 until numHashes).map(h =>
        min(pmod(col("h1") + lit(h.toLong) * col("h2"), lit(M32))).as(s"m$h"))
      val sig = idx.groupBy(col("doc"))
        .agg(mins.head, mins.tail: _*)
        .select(col("doc"),
          array((0 until numHashes).map(h => col(s"m$h")): _*).as("sig"))
      val bandedAll = sig
        .select(col("doc"),
          posexplode(lshBands(col("sig"), bands, numHashes / bands))
            .as(Seq("band_idx", "band_hash")))
      (if (cap > 0) {
        val byBucket = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_hash"))
          .orderBy(col("doc"))
        bandedAll
          .withColumn("__rk", row_number().over(byBucket))
          .filter(col("__rk") <= cap)
          .drop("__rk")
      } else bandedAll)
        .write.mode("overwrite").parquet(s"$sliceDir/banded")
    }
    val banded = spark.read.parquet(s"$sliceDir/banded")
    // stage 3: candidate pairs, STAGED — the r17 form rebuilt the band
    // self-join inside every slice's verify action (slices x one full
    // join over the banded table); landing it once on parquet makes each
    // slice a cheap pruned scan and gives the per-slice Bloom builder a
    // narrow table to aggregate
    staged {
      val a = banded.as("a"); val b = banded.as("b")
      a.join(b,
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc") < col("b.doc"))
        .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
        .distinct()
        .write.mode("overwrite").parquet(s"$sliceDir/cand")
    }
    val cand = spark.read.parquet(s"$sliceDir/cand")
    val inv = idx.select(col("doc"), col("s"))
    (0 until slices).foreach { k =>
      staged {
        val slice =
          if (slices == 1) cand
          else cand.filter(
            pmod(xxhash64(col("id_a"), col("id_b")), lit(slices)) === k)
        // SLICE-SCOPED INDEX PRE-FILTER (guide §3.2): the verify joins
        // only ever match index rows of docs that appear in THIS
        // slice's pairs, but the r17 form shuffled the FULL shingle
        // index (~200 x corpus rows) through both joins of every slice
        // — the measured 40M-doc disk killer. A Bloom filter over the
        // slice's doc-id hashes drops non-candidate docs' rows map-side,
        // before the exchange. False positives only add shuffle bytes;
        // the filter is on doc, so a true candidate doc keeps ALL its
        // rows — per-doc sizes (the jaccard denominator) stay exact.
        val nPairs = slice.count()
        val bc =
          if (nPairs == 0) None // stat.bloomFilter NPEs on an empty frame
          else Some(sc.broadcast(slice
            .select(xxhash64(col("id_a")).as("h"))
            .union(slice.select(xxhash64(col("id_b")).as("h")))
            .stat.bloomFilter("h", math.max(1000L, 2L * nPairs), 0.01)))
        val invK = bc match {
          case None => inv.limit(0) // empty slice: schema-correct empty out
          case Some(b) =>
            val mightHave = udf((h: Long) => b.value.mightContainLong(h))
            inv.filter(mightHave(xxhash64(col("doc"))))
        }
        verifyJaccard(slice, invK, threshold, fatIndex)
          .write.mode("overwrite").parquet(s"$sliceDir/pairs/slice=$k")
        bc.foreach(_.destroy())
      }
    }
    // the staged front half is dead once the last slice lands — free it
    locally {
      val conf = spark.sparkContext.hadoopConfiguration
      Seq(s"$sliceDir/idx", s"$sliceDir/banded", s"$sliceDir/cand")
        .foreach { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(conf)
          fs.delete(path, true)
        }
    }
    spark.read.parquet(s"$sliceDir/pairs")
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact n-gram Jaccard join with PREFIX FILTERING (AllPairs/PPJoin
    * family — Bayardo et al. WWW'07, Xiao et al. WWW'08; public
    * similarity-join literature).
    *
    * A naive inverted-index self-join blows up on frequent shingles: a
    * shingle shared by d documents contributes d²/2 candidate rows, and
    * at corpus scale hot shingles dominate. The prefix principle keeps
    * the join EXACT while pruning: order each doc's shingles by global
    * rarity (df asc, string tiebreak); if J(x,y) >= t, then x and y must
    * share a shingle within their first |z| - ceil(t*|z|) + 1 shingles —
    * so the self-join only probes those prefixes (the RAREST shingles,
    * small buckets by construction), with the t*|x| <= |y| <= |x|/t
    * length filter applied in the join condition. Candidates are then
    * verified with exact Jaccard over the full index. No false
    * negatives; identical output to the naive join.
    */
  def ngramJaccard(docs: DataFrame, id: String, text: Column,
                   shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val inv = distinctShingles(shingleRows(docs, id, text, shingleN))
    val common = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    jaccardFilter(common, docSizes(inv), threshold)
  }

  /** Prefix-filtered variant of [[ngramJaccard]] — same output, different
    * cost model. The direct pair-count above materializes one row per
    * co-occurring (pair, shingle): optimal while shingle doc-frequencies
    * are modest. On corpora with HOT shingles (df in the thousands+),
    * that join emits df² rows per hot shingle; this variant prunes with
    * the prefix principle first and verifies only surviving candidates,
    * trading two extra narrow joins for immunity to df skew. Pick per
    * corpus; both are exact.
    */
  /** Whether [[ngramJaccardAuto]] should take the prefix-filtered
    * branch for this corpus — exposed for tests pinning the flip.
    */
  def usePrefixNgram(docs: DataFrame,
                     switchRows: Long = DefaultNgramPrefixRows): Boolean =
    estimatedRows(docs) > switchRows

  /** Cost-based [[ngramJaccard]]: direct pair-count while the planner
    * estimates the corpus under [[DefaultNgramPrefixRows]], the
    * prefix-filtered PPJoin form above it. Both branches are exact and
    * emit identical pairs (pinned by DedupSpec), so this is a pure
    * strategy switch — the statistics read is plan-only (no job), the
    * same free-decision posture as the `fatIndex` auto mode.
    */
  def ngramJaccardAuto(docs: DataFrame, id: String, text: Column,
                       shingleN: Int = 3, threshold: Double = 0.5,
                       fatIndex: Option[Boolean] = None,
                       switchRows: Long = DefaultNgramPrefixRows): DataFrame =
    if (usePrefixNgram(docs, switchRows))
      ngramJaccardPrefix(docs, id, text, shingleN, threshold, fatIndex)
    else
      ngramJaccard(docs, id, text, shingleN, threshold)

  def ngramJaccardPrefix(docs: DataFrame, id: String, text: Column,
                         shingleN: Int = 3, threshold: Double = 0.5,
                         fatIndex: Option[Boolean] = None): DataFrame = {
    val inv = shingleRows(docs, id, text, shingleN)
      .select(col("doc"), xxhash64(col("s0")).as("s"), col("s0"))
      .persist()
    val sizes = docSizes(inv)
    val dfTab = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val ranked = inv.join(dfTab, "s").join(sizes, "doc")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc")).orderBy(col("df"), col("s0"))))
    val prefix = ranked
      .filter(col("rk") <= col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1)
      .select(col("doc"), col("s"), col("n_sh"))
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc") &&
          col("a.n_sh") >= lit(threshold) * col("b.n_sh") &&
          col("b.n_sh") >= lit(threshold) * col("a.n_sh"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
    verifyJaccard(candidates, inv.select(col("doc"), col("s")), threshold,
      fatIndex)
  }

  /** Persisted inverted index (doc, hashed shingle). The shingle string is
    * folded to a 64-bit hash before any join — the shuffle key is 8 bytes
    * instead of an n-word string; the hash never leaves the engine, so a
    * Spark-only hash is safe (md5 stays only where the cross-engine oracle
    * recomputes signatures).
    */
  private def distinctShingles(rows: DataFrame): DataFrame =
    rows.select(col("doc"), xxhash64(col("s0")).as("s"))
      .persist()

  private def docSizes(inv: DataFrame): DataFrame =
    inv.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))

  /** Exact Jaccard over distinct shingle sets for given candidate pairs.
    * The candidate set is tiny relative to the index (that is the point of
    * LSH) — AQE broadcasts it into both index joins.
    */
  /** Planner-estimated row count for a DataFrame, with no job: prefer
    * the optimizer's rowCount when statistics carry one, else derive it
    * from sizeInBytes over the schema's default row width. Used by the
    * `fatIndex` auto mode so the fat-vs-thin strategy decision is free.
    */
  def estimatedRows(df: DataFrame): Long = {
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount.map(r =>
      if (r.isValidLong) r.toLong else Long.MaxValue
    ).getOrElse {
      val width = math.max(1,
        df.schema.map(_.dataType.defaultSize).sum)
      // sizeInBytes defaults to Long.MaxValue for stat-less leaves and
      // multiplies through join estimates, so the BigInt can exceed
      // Long.MaxValue — BigInt.toLong would then WRAP NEGATIVE and the
      // fat-corpus/fat-index shuffle_hash pins would silently read
      // "small" at exactly the scales they protect. Unestimable = fat.
      val est = stats.sizeInBytes / width
      if (est.isValidLong) est.toLong else Long.MaxValue
    }
  }

  private def verifyJaccard(candidates: DataFrame, inv: DataFrame,
                            threshold: Double,
                            fatIndex: Option[Boolean]): DataFrame = {
    // shuffle_hash on the bounded side WHEN THE INDEX IS FAT:
    // sort-merge would SORT the full shingle index (billions of rows
    // at corpus scale) on BOTH verify joins — measured as ~375 GB of
    // sort spill on a 2-executor local-cluster heavy run (653 spills
    // × 576 MiB) while the single-JVM run's larger unified pool
    // absorbed it. Hash-building the candidate side streams the index
    // unsorted; strategy only, same rows out. Conditional because a
    // pinned hint also blocks AQE's runtime broadcast conversion,
    // which is the better plan at small scale. `fatIndex` lets the
    // caller decide without an extra action; when unset, auto mode
    // reads the optimizer's size estimate for the index plan instead
    // of running a count job — constructing the result stays a pure
    // plan operation at any scale. The estimate is conservative (scan
    // stats flow through the persisted projection), and the decision
    // only picks a join STRATEGY, so an estimate miss costs plan
    // quality, never rows.
    val big = fatIndex.getOrElse(estimatedRows(inv) > DefaultIndexHintRows)
    def h(df: DataFrame): DataFrame =
      if (big) df.hint("shuffle_hash") else df
    val common = h(candidates)
      .join(inv.as("sa"), col("sa.doc") === col("id_a"))
    val common2 = h(common)
      .join(inv.as("sb"),
        col("sb.doc") === col("id_b") && col("sa.s") === col("sb.s"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    jaccardFilter(common2, docSizes(inv), threshold, fatCorpus = big)
  }

  /** jaccard = common / (|A| + |B| - common), thresholded. The per-doc
    * size table is orders smaller than the pair table at small scale —
    * AQE broadcasts it. But it has CORPUS cardinality (one row per
    * doc), and Catalyst's aggregate size estimate undershoots it: at
    * 20M docs the planner chose to BROADCAST the 2.7 GB size table
    * (500 collect tasks × 5.5 MB heap-OOM'd both executors). When the
    * caller knows the corpus is fat, hint shuffle_hash on the PAIR
    * side so the size table streams through an ordinary exchange.
    */
  private def jaccardFilter(common: DataFrame, sizes: DataFrame,
                            threshold: Double,
                            fatCorpus: Boolean = false): DataFrame = {
    def h(df: DataFrame): DataFrame =
      if (fatCorpus) df.hint("shuffle_hash") else df
    h(h(common)
      .join(sizes.as("za"), col("za.doc") === col("id_a")))
      .join(sizes.as("zb"), col("zb.doc") === col("id_b"))
      .withColumn("jaccard",
        round(col("n_common") /
          (col("za.n_sh") + col("zb.n_sh") - col("n_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash: 64-bit bitwise-majority fingerprint over token hashes.
    * Token hash = first 16 md5 hex chars as a signed two's-complement
    * long (engine-portable; `conv(_, 16, -10)` is the signed decode).
    * One explode + one groupBy — linear, no pairwise work. 64 bits (vs
    * an earlier 32) so the band space below is wide enough that bucket
    * populations stay sub-quadratic at corpus scale.
    */
  def simhash(docs: DataFrame, id: String, text: Column): DataFrame = {
    val tok = docs.select(col(id).as("doc"), explode(tokens(text)).as("t"))
      .withColumn("h",
        conv(substring(md5(col("t")), 1, 16), 16, -10).cast("long"))
    val bitAggs = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    tok.groupBy(col("doc"))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .withColumn("simhash",
        // bitwiseOR, not +: bit 63 is Long.MinValue and ANSI-mode
        // addition would overflow-check the sum
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _))
      .select(col("doc"), col("simhash"))
      // one row per doc — persisting lets the pairs pipeline (and any
      // repeated call over the same input) reuse the token-explode agg
      .persist()
  }

  /** Hamming-near pairs on simhash fingerprints (block by 16-bit bands:
    * near pairs share >= 1 of 4 bands when hamming distance is small).
    * 4×16-bit bands give 65,536 bucket values per band, so even a
    * billion-doc corpus averages ~15k docs per bucket — the candidate
    * join stays tractable where 8-bit bands (256 buckets) went
    * quadratic.
    */
  def simhashPairs(fingerprints: DataFrame, maxHamming: Int = 3): DataFrame = {
    val banded = fingerprints.select(col("doc"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
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

  /** Duplicated-span statistics — the suffix-array-free approximation of
    * exact-substring dedup run on production corpora (the "remove
    * repeated 50-token spans" practice of Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"):
    * slide a `windowTokens`-token window with `stride` over each doc,
    * hash each window, count DISTINCT docs per window corpus-wide; a
    * window seen in 2+ docs is a duplicated span. Per doc: window
    * count, duplicated-window count, dup ratio (0 for docs shorter than
    * one window).
    *
    * Scale: the explode factor is ~len/stride rows per doc (linear);
    * counting is one hash-partitioned groupBy on the window hash, and
    * the join back is on the same key — no skewed all-pairs work, no
    * driver-side state. md5 windows keep the pipeline engine-portable.
    */
  def dupSpans(docs: DataFrame, id: String, text: Column,
               windowTokens: Int = 8, stride: Int = 4): DataFrame = {
    val toks = docs.select(col(id).as("doc"), tokens(text).as("t"))
    val nwin = when(size(col("t")) >= windowTokens,
      floor((size(col("t")) - windowTokens) / lit(stride)).cast("int") + 1)
      .otherwise(0)
    // persisted: the window inventory feeds both the per-hash count agg
    // and the per-doc join — uncached it (and its upstream) builds twice
    val exploded = toks.withColumn("nwin", nwin)
      .filter(col("nwin") > 0)
      .select(col("doc"),
        explode(transform(sequence(lit(0), col("nwin") - 1),
          i => md5(concat_ws(" ",
            slice(col("t"), i * stride + 1, lit(windowTokens)))))).as("wh"))
      .persist()
    val counts = exploded.groupBy(col("wh"))
      .agg(countDistinct(col("doc")).as("nd"))
    val per = exploded.join(counts, "wh")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("nw"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("ndup"))
    docs.select(col(id).as("doc"))
      .join(per, Seq("doc"), "left")
      .select(col("doc"),
        coalesce(col("nw"), lit(0L)).as("n_windows"),
        coalesce(col("ndup"), lit(0L)).as("n_dup_windows"),
        when(coalesce(col("nw"), lit(0L)) > 0,
          round(col("ndup") / col("nw"), 6)).otherwise(lit(0.0))
          .as("dup_span_ratio"))
  }

  /** Exact duplicated-span REMOVAL (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better" — their
    * exact-substring dedup, here over stride-1 token windows instead of
    * a suffix array): any `windowTokens`-token window whose hash occurs
    * more than once corpus-wide is excised from every occurrence EXCEPT
    * the canonical first one (min (doc, start) — the usual keep-first
    * convention), overlapping excisions merged per document before
    * cutting so adjacent duplicated windows remove one contiguous span.
    *
    * Scale shape: one shuffle on window hash (count + canonical pick —
    * map-side combined), one shuffle on doc (the islands window + the
    * rebuild agg); the window inventory is stride-1 so it is
    * O(corpus tokens) rows — the same order as tokenization itself.
    * Interval merging is the gaps-and-islands window pattern, not a
    * per-doc loop. Returns (doc, n_tokens, n_removed, n_spans_removed,
    * cleaned_text).
    */
  def removeDupSpans(docs: DataFrame, id: String, text: Column,
                     windowTokens: Int = 8): DataFrame = {
    val W = windowTokens
    // both persisted: toks feeds the window explode AND the final
    // rebuild join; wins feeds the dup-hash agg AND the cut join. Un-
    // cached, the upstream chain (often a heavy gate/redact pipeline)
    // re-evaluates ~3x and the md5 window inventory is built twice —
    // the same narrow-subtree posture as the LSH index persist.
    val toks = docs.select(col(id).as("doc"), tokens(text).as("t"))
      .withColumn("n_tokens", size(col("t")))
      .persist()
    // stride-1 windows with their 1-based start token index
    val wins = toks.filter(col("n_tokens") >= W)
      .select(col("doc"),
        posexplode(transform(sequence(lit(0), col("n_tokens") - W),
          i => md5(concat_ws(" ", slice(col("t"), i + 1, lit(W)))))))
      .select(col("doc"), (col("pos") + 1).as("start"), col("col").as("wh"))
      .persist()
    // canonical occurrence per duplicated hash = min (doc, start)
    val dupHashes = wins.groupBy(col("wh"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc"), col("start"))).as("canon"))
      .filter(col("cnt") > 1)
    val toCut = wins.join(dupHashes, "wh")
      .filter(!(col("doc") === col("canon.doc") &&
        col("start") === col("canon.start")))
      .select(col("doc"), col("start"), (col("start") + W - 1).as("end"))
    // merge overlapping/adjacent ranges per doc (gaps-and-islands)
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("start"), col("end"))
    val runMax = max(col("end")).over(byDoc
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val islands = toCut
      .withColumn("new_island",
        when(runMax.isNull || col("start") > runMax, 1).otherwise(0))
      .withColumn("island", sum(col("new_island")).over(byDoc))
      .groupBy(col("doc"), col("island"))
      .agg(min(col("start")).as("s"), max(col("end")).as("e"))
    val perDoc = islands.groupBy(col("doc"))
      .agg(sort_array(collect_list(struct(col("s"), col("e"))))
          .as("spans"),
        count(lit(1)).as("n_spans_removed"),
        sum(col("e") - col("s") + 1).as("n_removed"))
    // rebuild: keep tokens whose 1-based index is outside every span —
    // HOF filter with index, no per-token explode
    toks.join(perDoc, Seq("doc"), "left")
      .select(col("doc"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_spans_removed"), lit(0L)).as("n_spans_removed"),
        array_join(
          when(col("spans").isNull, col("t")).otherwise(
            filter(col("t"), (_, i) =>
              !exists(col("spans"), r =>
                i + 1 >= r.getField("s") && i + 1 <= r.getField("e")))),
          " ").as("cleaned_text"))
  }

  /** Connected components over an undirected near-dup edge list — the
    * clustering step after candidate generation: every doc in a
    * component is a near-dup of the others (transitively), and dedup
    * keeps one canonical doc per component (the min id, the usual
    * convention).
    *
    * Pregel-style iterative min-label propagation with POINTER JUMPING
    * (label := label(label) each round — path halving), so convergence
    * is O(log diameter) rounds rather than O(diameter); LSH dup-cluster
    * graphs are mostly tiny cliques with the occasional chain, and the
    * jump step keeps chains from serializing the loop. Every step is a
    * key-partitioned join/groupBy — the driver holds one change-count
    * per round, never the graph. Each round checkpoints the label
    * table: the iteration count is bounded, but the PLAN would otherwise
    * nest one join deeper per round and analysis cost goes quadratic.
    * With `checkpointDir` set the rounds use RELIABLE checkpoints
    * (survive executor loss — the right mode on a real cluster);
    * without it, lineage-truncating localCheckpoint (fine on a
    * single-node sandbox, fragile at scale).
    *
    * Exits LOUDLY if maxIter is hit before convergence: partially-merged
    * labels must not masquerade as clusters (pointer jumping makes 25
    * rounds ample for any real diameter, so this firing means the input
    * graph is pathological).
    *
    * `nodes`: one `id` per doc (singletons come out as their own
    * cluster). `edges`: (id_a, id_b) pairs, any orientation, dup-safe.
    * Returns (id, cluster) with cluster = min id in the component.
    */
  private def integralIdType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == org.apache.spark.sql.types.LongType ||
      dt == org.apache.spark.sql.types.IntegerType

  /** Min-label union-find over a collected (lo, hi) edge list — the
    * driver core of the small-graph fast paths. Returns id -> component
    * min for every NON-CANONICAL id (an id whose component min is
    * smaller than itself); canonical ids and singletons are absent.
    */
  private def driverLabels(probe: Array[org.apache.spark.sql.Row],
                           idType: org.apache.spark.sql.types.DataType)
      : java.util.HashMap[Long, Long] = {
    def toL(r: org.apache.spark.sql.Row, i: Int): Long =
      if (idType == org.apache.spark.sql.types.LongType) r.getLong(i)
      else r.getInt(i).toLong
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != c) {
        val nx = parent.get(c); parent.put(c, r); c = nx
      }
      r
    }
    probe.foreach { r =>
      val ra = find(toL(r, 0)); val rb = find(toL(r, 1))
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    val out = new java.util.HashMap[Long, Long]()
    parent.keySet().forEach { idv =>
      val c = find(idv)
      if (c != idv) out.put(idv, c)
    }
    out
  }

  /** The DROP SET of a near-dup pair list: every id that appears in a
    * pair and is not its connected component's min id — semantically
    * `connectedComponents(touched, pairs).filter(id =!= comp)`, where
    * `touched` is the distinct pair-endpoint set (ids in no pair are
    * always canonical, so clustering them adds nothing). When the pair
    * list fits under `driverEdges` the set comes straight out of the
    * driver union-find as a bounded LOCAL relation: the consuming
    * anti-join's plan then carries no trace of the pair pipeline (the
    * verify joins run once, in the probe, instead of once per
    * downstream action). Output: one `outCol` column of the input id
    * type. Above the cap (or for non-integral ids) it falls back to
    * the distributed formulation unchanged.
    */
  def nearDupDrops(pairs: DataFrame, outCol: String,
                   hintRows: Long = DefaultHintRows,
                   driverEdges: Int = DefaultDriverEdges): DataFrame = {
    val spark = pairs.sparkSession
    val idType = pairs.schema("id_a").dataType
    val numericId = integralIdType(idType)
    if (numericId && driverEdges > 0) {
      val oriented = pairs
        .select(least(col("id_a"), col("id_b")).as("lo"),
          greatest(col("id_a"), col("id_b")).as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct()
        .persist()
      val probe = oriented.limit(driverEdges + 1).collect()
      if (probe.length <= driverEdges) {
        oriented.unpersist()
        val labels = driverLabels(probe, idType)
        val entries = new java.util.ArrayList[org.apache.spark.sql.Row]()
        labels.keySet().forEach { idv =>
          entries.add(
            if (idType == org.apache.spark.sql.types.LongType)
              org.apache.spark.sql.Row(idv)
            else org.apache.spark.sql.Row(idv.toInt))
        }
        return spark.createDataFrame(entries,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(outCol, idType))))
      }
      oriented.unpersist()
    }
    val touched = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct()
    connectedComponents(touched, pairs, hintRows = hintRows,
        driverEdges = 0)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(outCol))
  }

  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 25,
                          checkpointDir: Option[String] = None,
                          hintRows: Long = DefaultHintRows,
                          driverEdges: Int = DefaultDriverEdges): DataFrame = {
    val spark = nodes.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    // Dedup on the ORIENTED pair (half the rows of the doubled list),
    // then mirror without a second distinct — the setup shuffle is the
    // only full-edge-list pass whose width we control.
    val oriented = edges
      .select(least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .persist()
    // SMALL-GRAPH FAST PATH (the graph analogue of a broadcast join):
    // near-dup edge lists are tiny relative to the corpus in the normal
    // regime, and the iterative loop below pays ~3 actions per round
    // (checkpoint, count, merge) regardless of size. Probe with a
    // bounded limit-collect against the persisted edge list: if every
    // edge fits under `driverEdges`, run min-label union-find on the
    // driver (microseconds) and attach labels with ONE broadcast join —
    // identical output (comp = min id of the component), no iteration.
    // Numeric ids only: the driver comparison must match Spark's
    // `least` ordering, which is guaranteed for integral types but not
    // for collated strings. Above the cap (or non-numeric ids) the
    // distributed loop runs exactly as before; the probe's partial
    // compute lands in the edge cache the loop reads anyway.
    val idType = nodes.schema("id").dataType
    val numericId = integralIdType(idType)
    val probe: Array[org.apache.spark.sql.Row] =
      if (numericId && driverEdges > 0)
        oriented.limit(driverEdges + 1).collect()
      else Array.empty
    if (numericId && driverEdges > 0 && probe.length <= driverEdges) {
      oriented.unpersist()
      // only non-canonical ids need a row (comp(x) < x implies x lost a
      // union, so x has a parent entry); canonical ids coalesce to id
      val labels = driverLabels(probe, idType)
      val entries = new java.util.ArrayList[org.apache.spark.sql.Row]()
      labels.forEach { (idv, c) =>
        entries.add(
          if (idType == org.apache.spark.sql.types.LongType)
            org.apache.spark.sql.Row(idv, c)
          else org.apache.spark.sql.Row(idv.toInt, c.toInt))
      }
      val mapDf = spark.createDataFrame(entries,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("__mc", idType))))
      return nodes.join(broadcast(mapDf), Seq("id"), "left")
        .select(col("id"), coalesce(col("__mc"), col("id")).as("comp"))
    }
    val und = oriented.select(col("lo").as("src"), col("hi").as("dst"))
      .union(oriented.select(col("hi").as("src"), col("lo").as("dst")))
    var labels = ckpt(nodes.select(col("id"), col("id").as("comp")))
    // Join-strategy guard, SIZE-CONDITIONAL: a shuffle_hash hint on the
    // bounded side keeps sort-merge from re-sorting the full label
    // table three times per round — on a multi-JVM cluster at 10M
    // nodes that sort was the dominant per-round cost (25 s vs 8 s
    // single-JVM on the full-frontier round). But a hint also pins the
    // strategy, blocking AQE's runtime broadcast conversion — which is
    // the BETTER plan when the bounded side is tiny (every round after
    // the frontier collapses, and entire small-SF runs). So hint only
    // while the bounded side is too big to broadcast; `hintRows`
    // (default ~10 MB of (long,long) unsafe rows) is a config knob for
    // clusters whose broadcast threshold differs.
    def maybeHash(df: DataFrame, rows: Long): DataFrame =
      if (rows > hintRows) df.hint("shuffle_hash") else df
    // round 1: every node announces. labels is already materialized by
    // the eager checkpoint above, so this count is a cached-block scan,
    // not a job over the input — the ONLY extra action in the loop
    // setup (the edge list materializes lazily on round 1's join; an
    // up-front und.count() was measured as +27% on the sf0.1 bench for
    // zero benefit at that scale).
    var frontierRows = labels.count()
    // FRONTIER (delta) propagation: only nodes whose label changed last
    // round send messages. A neighbor's label can only matter the round
    // after it changed, so restricting the edge join to the frontier
    // loses nothing — and because LSH dup graphs are mostly tiny
    // cliques that settle in round 1, the per-round edge-join cost
    // shrinks geometrically instead of rescanning all |E| each round.
    // Round 1's frontier is every node (each must announce its id).
    var frontier = labels
    var changed = 1L
    var iter = 0
    // GRAFT_CC_LOG=true prints per-round frontier size + wall time —
    // the numbers that localize whether a slow clustering is
    // round-count (graph shape) or per-round overhead (checkpoint /
    // shuffle), which differ by deployment mode
    val ccLog = sys.env.get("GRAFT_CC_LOG").exists(_.toBoolean)
    while (changed > 0 && iter < maxIter) {
      val tRound = System.nanoTime()
      // messages from the frontier only; min per receiver. The hint
      // goes on the FRONTIER side — the hinted side is the hash BUILD
      // side, and building over the full doubled edge list would risk
      // per-partition build OOM at corpora beyond the measured 10M-node
      // run (where sort-merge would at least have spilled gracefully);
      // hashing the bounded frontier streams the edge list unsorted,
      // which is the whole point of the hint.
      val msgs = und
        .join(maybeHash(frontier.select(col("id").as("src"),
          col("comp").as("scomp")), frontierRows), "src")
        .groupBy(col("dst")).agg(min(col("scomp")).as("nbrComp"))
      // keep only strict improvements — everything else is already
      // settled and drops out of the working set
      // msgs/improved row counts aren't known without an action; the
      // frontier size is the free proxy (exact from last round's
      // count) — it tracks the working-set collapse, which is what the
      // hint decision actually needs
      val improved = labels
        .join(maybeHash(msgs.select(col("dst").as("id"), col("nbrComp")),
          frontierRows), Seq("id"))
        .filter(col("nbrComp") < col("comp"))
        .select(col("id"), col("nbrComp").as("comp"))
      // pointer jump the improved rows through the CURRENT table
      // (comp := label(comp), path halving): labels only ever hold
      // member ids of the same component, so the jump is safe and
      // keeps chain components from serializing the loop. Jump target
      // labels satisfy label(k) ≤ k, so the jumped value never
      // regresses above the improvement.
      val jumped = maybeHash(improved.as("x"), frontierRows)
        .join(labels.select(col("id").as("cid"), col("comp").as("ccomp")).as("y"),
          col("x.comp") === col("y.cid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("y.ccomp"), col("x.comp")).as("comp"))
      val front = ckpt(jumped)
      changed = front.count()
      if (changed > 0) {
        // merge the delta back — ONE keyed join over the label table
        // per round (the old scheme rescanned |E|+2|N| every round)
        labels = ckpt(labels.as("l")
          .join(maybeHash(front.select(col("id"),
            col("comp").as("fcomp")).as("f"), changed), Seq("id"), "left")
          .select(col("id"), coalesce(col("fcomp"), col("comp")).as("comp")))
        frontier = front
        frontierRows = changed
      }
      iter += 1
      if (ccLog) println(f"[cc] round $iter changed=$changed " +
        f"${(System.nanoTime() - tRound) / 1e9}%.1f s")
    }
    oriented.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still moving) — refusing to return " +
          "partially-merged clusters")
    labels
  }
}
