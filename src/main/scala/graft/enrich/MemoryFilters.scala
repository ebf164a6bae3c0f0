package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The memory enrichment table's probabilistic-filter variants —
  * reference src/enrichment_tables/memory/bloom_table.rs (372 LoC:
  * insert-only membership, `filter: {type: bloom, max_entries}`) and
  * cuckoo_table.rs (998 LoC: fingerprint buckets with removal,
  * `filter: {type: cuckoo, max_entries, fingerprint_bits, bucket_size,
  * max_kicks}`). Lookup semantics (find_table_rows in both files): a
  * single Equals condition; a hit returns `{key, value: null}` (cuckoo
  * adds `fingerprint` as uppercase hex); a miss returns no rows.
  *
  * Spark-first shape: the filter itself is a BOUNDED artifact (bloom:
  * `m` bits ≈ 9.6 × max_entries; cuckoo: ≤ max_entries fingerprints) —
  * the same bounded-driver-codebook stance as k-means/BPE. The build is
  * one distributed pass (explode lanes → distinct ≤ m rows); the probe
  * side is a pure projection over a broadcast word array (bloom) or a
  * broadcast (bucket, fingerprint) join (cuckoo) — shuffle-free on the
  * 100 TB event stream.
  *
  * Hash lanes are md5-based so an external oracle can recompute the
  * EXACT same bits: lane_i(key) = int(hex(md5(key ‖ ":" ‖ i))[0,8)) mod m
  * — expressible in both Spark (`conv(substring(md5(..),1,8),16,10)`)
  * and ANSI SQL engines.
  */
object MemoryFilters {

  /** First 4 md5 bytes as an UNSIGNED 32-bit value — fits a signed
    * 64-bit lane everywhere (Spark long, ANSI BIGINT), so an external
    * oracle recomputes the identical hash with
    * `CAST(('0x' || substr(md5(s),1,8)) AS BIGINT)`.
    */
  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    BigInt(1, d.take(4)).toLong
  }

  /** Column twin of [[h32]]. */
  private def h32Col(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  // ---- bloom ----------------------------------------------------------

  /** bloomy's optimal sizing at its default 1% false-positive rate
    * (bloom_table.rs:62 `bloom::optimal_bits(max_entries, DEFAULT_FPR)`):
    * m = ⌈-n·ln p / ln²2⌉ bits, k = round(m/n · ln 2) hash lanes.
    */
  def bloomParams(maxEntries: Int, fpr: Double = 0.01): (Int, Int) = {
    val m = math.ceil(-maxEntries * math.log(fpr) /
      (math.log(2) * math.log(2))).toInt
    val k = math.max(1, math.round(m.toDouble / maxEntries * math.log(2)).toInt)
    (m, k)
  }

  /** The k lane bit-positions of a key as an array<long> Column. */
  def bloomLanes(key: Column, m: Int, k: Int): Column =
    array((0 until k).map { i =>
      pmod(conv(substring(md5(concat(key.cast("string"), lit(s":$i"))), 1, 8),
        16, 10).cast("long"), lit(m.toLong))
    }: _*)

  private def laneOf(key: String, i: Int, m: Int): Int = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$key:$i".getBytes("UTF-8"))
    (BigInt(1, digest.take(4)) % m).toInt
  }

  /** The built filter: a word-packed bitset (m/64 longs, broadcast as a
    * literal — bounded by config, NOT by data volume).
    */
  final class BloomTable(val maxEntries: Int) {
    val (m, k) = bloomParams(maxEntries)
    val words = new Array[Long]((m + 63) / 64)
    def insert(key: String): Unit =
      (0 until k).foreach(i => setBit(laneOf(key, i, m)))
    def contains(key: String): Boolean =
      (0 until k).forall { i =>
        val b = laneOf(key, i, m)
        (words(b / 64) & (1L << (b % 64))) != 0
      }
    def setBit(b: Int): Unit = words(b / 64) |= 1L << (b % 64)
  }

  /** Distributed build: ONE pass over the key stream — explode the k
    * lanes, distinct (≤ m rows: the shuffle is bounded by the filter
    * size, not the data volume), set bits driver-side.
    */
  def bloomTable(updates: DataFrame, keyCol: Column,
                 maxEntries: Int): BloomTable = {
    val t = new BloomTable(maxEntries)
    updates.select(explode(bloomLanes(keyCol, t.m, t.k)).as("b"))
      .distinct()
      .collect() // bounded: ≤ m rows (the filter bitset itself)
      .foreach(r => t.setBit(r.getLong(0).toInt))
    t
  }

  /** Membership as a pure Column: O(k) word probes per row against the
    * broadcast literal word array — no join, no shuffle.
    */
  def bloomMember(probe: Column, t: BloomTable): Column = {
    val wordsLit = typedLit(t.words.toSeq)
    forall(bloomLanes(probe, t.m, t.k), b =>
      element_at(wordsLit, (b / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(b, lit(64L)).cast("int"))) =!= 0L)
  }

  // ---- cuckoo ---------------------------------------------------------

  /** Partial-key cuckoo filter (cuckoo_table.rs semantics: fingerprint
    * per key, two candidate buckets, eviction kicks up to max_kicks;
    * supports removal; no false negatives while under capacity).
    * Defaults mirror the reference (fingerprint_bits=8, bucket_size=4,
    * max_kicks; cuckoo_table.rs:175-213). Deterministic: md5-based
    * hashes, round-robin kick choice (the reference kicks randomly —
    * determinism keeps reruns byte-identical with the same guarantees).
    */
  final class CuckooTable(val maxEntries: Int,
                          val fingerprintBits: Int = 8,
                          val bucketSize: Int = 4,
                          val maxKicks: Int = 500) {
    val nBuckets: Int = {
      var n = 1
      while (n * bucketSize < maxEntries) n <<= 1
      n
    }
    private val buckets =
      Array.fill(nBuckets)(scala.collection.mutable.ArrayBuffer[Int]())
    private var kickCursor = 0

    /** Non-zero fingerprint in [1, 2^bits): unsigned mod (2^bits − 1)
      * plus one — the Column probe recomputes the identical value.
      */
    def fingerprint(key: String): Int =
      (h32(s"fp:$key") % ((1L << fingerprintBits) - 1)).toInt + 1
    def fingerprintHex(key: String): String = "%X".format(fingerprint(key))
    def bucket1(key: String): Int = (h32(key) % nBuckets).toInt
    /** The xor mask pairing a fingerprint's two candidate buckets. */
    def altXorOf(fp: Int): Int = (h32(s"fpb:$fp") % nBuckets).toInt
    private[enrich] def altBucket(i: Int, fp: Int): Int =
      (i ^ altXorOf(fp)) & (nBuckets - 1)

    def insert(key: String): Boolean = {
      val fp = fingerprint(key)
      val i1 = bucket1(key)
      val i2 = altBucket(i1, fp)
      if (buckets(i1).contains(fp) || buckets(i2).contains(fp)) return true
      if (buckets(i1).size < bucketSize) { buckets(i1) += fp; return true }
      if (buckets(i2).size < bucketSize) { buckets(i2) += fp; return true }
      var cur = i2
      var curFp = fp
      var kicks = 0
      while (kicks < maxKicks) {
        val slot = kickCursor % bucketSize
        kickCursor += 1
        val evicted = buckets(cur)(slot)
        buckets(cur)(slot) = curFp
        curFp = evicted
        cur = altBucket(cur, curFp)
        if (buckets(cur).size < bucketSize) { buckets(cur) += curFp; return true }
        kicks += 1
      }
      false // filter full (reference: insert error)
    }

    def remove(key: String): Boolean = {
      val fp = fingerprint(key)
      val i1 = bucket1(key)
      val i2 = altBucket(i1, fp)
      val b = if (buckets(i1).contains(fp)) Some(i1)
              else if (buckets(i2).contains(fp)) Some(i2) else None
      b.foreach(i => buckets(i).remove(buckets(i).indexOf(fp)))
      b.isDefined
    }

    def contains(key: String): Boolean = {
      val fp = fingerprint(key)
      val i1 = bucket1(key)
      buckets(i1).contains(fp) || buckets(altBucket(i1, fp)).contains(fp)
    }

    /** (bucket, fingerprint) pairs — ≤ max_entries rows, the broadcast
      * join side for distributed probes.
      */
    def entries: Seq[(Int, Int)] =
      buckets.zipWithIndex.flatMap { case (b, i) => b.map(fp => (i, fp)) }.toSeq

    /** Test hook: place a raw (bucket, fingerprint) entry directly. */
    private[enrich] def forceEntry(bucket: Int, fp: Int): Unit =
      buckets(bucket) += fp
  }

  /** Build from a key stream: distinct keys in first-seen order
    * (orderCol), collected under a LOUD capacity guard — the reference's
    * filter errors on insert past capacity, so the bounded collect IS
    * the semantics, not a scale compromise.
    */
  def cuckooTable(updates: DataFrame, keyCol: Column, orderCol: Column,
                  maxEntries: Int, fingerprintBits: Int = 8,
                  bucketSize: Int = 4, maxKicks: Int = 500): CuckooTable = {
    val keys = updates.groupBy(keyCol.cast("string").as("__k"))
      .agg(min(orderCol).as("__o"))
      .orderBy(col("__o"))
      .select(col("__k"))
      .collect() // bounded: capacity-guarded just below
    require(keys.length <= maxEntries,
      s"cuckoo filter feed has ${keys.length} distinct keys, " +
        s"exceeding max_entries=$maxEntries (reference: insert error)")
    val t = new CuckooTable(maxEntries, fingerprintBits, bucketSize, maxKicks)
    keys.foreach { r =>
      // the reference errors loudly on insert failure (cuckoo_table.rs
      // insert error); silently dropping the evicted fingerprint would
      // produce false negatives, which the filter promises never to do
      if (!t.insert(r.getString(0)))
        throw new IllegalStateException(
          s"cuckoo filter insert failed for key '${r.getString(0)}' after " +
            s"$maxKicks kicks (filter at ~${keys.length}/$maxEntries load); " +
            "raise max_entries (reference: insert error)")
    }
    t
  }

  /** Distributed membership probe: compute (fp, bucket1, bucket2)
    * columns executor-side, test membership against a broadcast literal
    * fp → bucket-array map — a ROW-PRESERVING projection (a join on
    * (bucket OR bucket) could emit duplicates when the same fingerprint
    * occupies both candidate buckets). Adds boolean `member` and the
    * reference's uppercase-hex `fingerprint` column. Shuffle-free.
    */
  def cuckooMember(df: DataFrame, probe: Column, t: CuckooTable): DataFrame = {
    val fpMod = lit((1L << t.fingerprintBits) - 1)
    val nb = lit(t.nBuckets.toLong)
    val fpCol = (pmod(h32Col(concat(lit("fp:"), probe.cast("string"))), fpMod)
      .cast("int") + 1)
    val b1 = pmod(h32Col(probe.cast("string")), nb).cast("int")
    // alt bucket xors with h32("fpb:"+fp) — fp has ≤ 2^bits values, so
    // resolve via a broadcast-sized literal map fp -> xor mask
    val xorMap = map((1 to ((1 << t.fingerprintBits) - 1)).flatMap { fp =>
      Seq(lit(fp), lit((h32(s"fpb:$fp") % t.nBuckets).toInt))
    }: _*)
    // fp -> sorted array of occupied buckets (≤ max_entries ints total)
    val byFp: Map[Int, Seq[Int]] =
      t.entries.groupBy(_._2).map { case (fp, es) =>
        fp -> es.map(_._1).distinct.sorted
      }
    val bucketMap: Column =
      if (byFp.isEmpty) map()
      else map(byFp.toSeq.sortBy(_._1).flatMap { case (fp, bs) =>
        Seq(lit(fp), array(bs.map(lit(_)): _*))
      }: _*)
    val withCols = df
      .withColumn("__fp", fpCol)
      .withColumn("__b1", b1)
      .withColumn("__b2",
        col("__b1").bitwiseXOR(element_at(xorMap, col("__fp")))
          .bitwiseAND(lit(t.nBuckets - 1)))
    val hit = element_at(bucketMap, col("__fp"))
    withCols
      .withColumn("member", coalesce(
        exists(hit, b => b === col("__b1") || b === col("__b2")),
        lit(false)))
      .withColumn("fingerprint",
        upper(conv(col("__fp").cast("string"), 10, 16)))
      .drop("__fp", "__b1", "__b2")
  }
}
