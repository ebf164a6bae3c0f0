package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: concatenate the corpus in a
  * deterministic global shuffle order (the [[Shards]] md5 conventions)
  * with a separator after each document, then chop the token stream
  * into fixed-length training sequences. The op emits per-document
  * PLACEMENT — global token offset, first/last sequence id, offset
  * within the first sequence — which is everything a training reader
  * needs to materialize windows without re-scanning the corpus.
  * (Documents straddle sequence boundaries by design; that is the
  * standard concat-and-chop pretraining layout.)
  *
  * Scale shape: a naive global running sum is a SINGLE-PARTITION window
  * — the classic 100 TB bottleneck. Here the cumulative offset is a
  * two-phase distributed prefix sum: per-bucket window cumsum (the
  * bucket is the md5 shard id, so this reuses the one hash shuffle) plus
  * a broadcast prefix of per-bucket totals (`buckets` long values on the
  * driver — bounded). Global order is bucket-major (bucket 0 packs
  * first), i.e. exactly the shard-major order a sharded reader consumes.
  */
object Packing {

  def pack(docs: DataFrame, key: Column, nTokens: Column, seqLen: Int,
           buckets: Int = 64, sepTokens: Int = 1): DataFrame = {
    require(seqLen > 0 && buckets > 0)
    // the prefix table is a PLAN-EMBEDDED map literal (O(buckets) plan
    // size) — ample for shard-count-scale bucket counts, guarded so a
    // runaway value fails loudly instead of blowing plan serialization;
    // past this, swap the literal for a broadcast join on __b
    require(buckets <= 65536,
      s"pack: buckets=$buckets exceeds the literal-prefix bound (65536)")
    val bucket = Shards.shardId(key, buckets)
    // persisted: phase 1 collects per-bucket totals EAGERLY and phase 2
    // re-reads the same frame — without the cache the entire upstream
    // chain (whatever produced the token counts) evaluates twice. The
    // cached projection is the narrow metadata row (key, counts), the
    // guide's decide-with-small-rows shape.
    val sized = docs
      .withColumn("__b", bucket)
      .withColumn("__n", nTokens.cast("long"))
      .withColumn("__sz", nTokens.cast("long") + sepTokens)
      .persist()
    // phase 1: per-bucket totals -> exclusive prefix, driver-side
    // (`buckets` rows — bounded regardless of corpus size)
    val totals = sized.groupBy(col("__b")).agg(sum(col("__sz")).as("__t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prefixes: Map[Long, Long] = {
      var acc = 0L
      (0L until buckets.toLong).map { b =>
        val p = b -> acc
        acc += totals.getOrElse(b, 0L)
        p
      }.toMap
    }
    val prefixCol = element_at(typedlit(prefixes), col("__b"))
    // phase 2: within-bucket exclusive cumsum over the shuffle order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b"))
      .orderBy(Shards.shuffleOrder(key): _*)
    val placed = sized
      .withColumn("offset",
        prefixCol + sum(col("__sz")).over(w) - col("__sz"))
      .withColumn("first_seq", floor(col("offset") / seqLen))
      .withColumn("last_seq",
        when(col("__n") > 0,
          floor((col("offset") + col("__n") - 1) / seqLen))
          .otherwise(floor(col("offset") / seqLen)))
      .withColumn("offset_in_seq", pmod(col("offset"), lit(seqLen.toLong)))
      .withColumn("n_seqs_spanned",
        (col("last_seq") - col("first_seq") + 1).cast("int"))
    placed.drop("__b", "__sz", "__n")
  }

  /** Total sequence count of a packed corpus (the reader's epoch size):
    * ceil(total stream tokens / seqLen).
    */
  def sequenceCount(docs: DataFrame, nTokens: Column, seqLen: Int,
                    sepTokens: Int = 1): Long = {
    val total = docs
      .agg(sum(nTokens.cast("long") + sepTokens)).head().getLong(0)
    (total + seqLen - 1) / seqLen
  }
}
