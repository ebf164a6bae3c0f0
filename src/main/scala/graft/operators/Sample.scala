package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `sample` — keep 1-in-`rate` (or a ratio) of events.
  *
  * Reference: /root/reference/src/transforms/sample/transform.rs (consistent
  * seahash on `key_field` :84-86 so equal keys sample together; `exclude`
  * bypass; `sample_rate` field written on kept events).
  *
  * The reference's count-based round-robin mode assumes a single ordered
  * stream — meaningless across 1000 executors. The scale-correct modes are
  * hash-coherent (deterministic per key, partition-local, no shuffle) and
  * ratio (Bernoulli). Both are pure filters: pushed to the scan, no state.
  */
object Sample {

  /** Hash-coherent sampling: keep keys whose 64-bit hash lands in the
    * first `1/rate` of the hash space. Equal keys are always kept or
    * always dropped together (the seahash-on-key_field semantic).
    */
  def byKey(df: DataFrame, key: Column, rate: Int,
            exclude: Option[Column] = None,
            rateField: String = "sample_rate"): DataFrame = {
    val keep = pmod(xxhash64(key), lit(rate)) === 0
    df.filter(exclude.map(e => e || keep).getOrElse(keep))
      .withColumn(rateField, lit(rate))
  }

  /** Portable variant of hash-coherent sampling keyed on an md5 bucket —
    * same semantics as [[byKey]] but reproducible in any engine with md5
    * (used by the cross-engine oracle; xxhash64 is Spark-specific).
    * Keeps keys whose first md5 hex nibble is < 16/rate.
    */
  def byKeyMd5(df: DataFrame, key: Column, rate16: Int,
               rateField: String = "sample_rate"): DataFrame = {
    require(16 % rate16 == 0, "rate must divide 16 for the nibble bucket")
    df.filter(conv(substring(md5(key.cast("string")), 1, 1), 16, 10)
        .cast("int") < lit(16 / rate16))
      .withColumn(rateField, lit(rate16))
  }

  /** Bernoulli ratio sampling (the reference's `ratio` mode). */
  def ratio(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Dynamic per-event sampling (transform.rs `ratio_field` /
    * `rate_field`, DynamicSampleFields): each event carries its own
    * ratio (0 < r ≤ 1, numeric or numeric string) or integer rate;
    * ratio wins when both parse (event_sample_mode), and invalid/missing
    * values fall back to the static `rate`. The kept event is stamped
    * with the EFFECTIVE rate as a string under `sample_rate_key`
    * (sample_rate_label — empty key disables). Deterministic hash draw
    * per key — a pure filter, pushed to the scan (the reference's
    * per-group counter is single-stream state; the hash draw is the
    * 1000-executor analogue with the same keep-probability).
    */
  def dynamic(df: DataFrame, key: Column,
              ratioField: Option[String], rateField: Option[String],
              staticRate: Int,
              exclude: Option[Column] = None,
              sampleRateKey: Option[String] = Some("sample_rate")): DataFrame = {
    val h = pmod(xxhash64(key), lit(1L << 32)) // uniform 32-bit draw
    def fieldCol(f: Option[String]): Column = f
      .filter(df.columns.contains)
      .map(c => col(c).cast("double"))
      .getOrElse(lit(null).cast("double"))
    val ratioC = {
      val r = fieldCol(ratioField)
      when(r > 0.0 && r <= 1.0, r)
    }
    val rateC = {
      val r = fieldCol(rateField).cast("long")
      when(r > 0L, r)
    }
    val keep =
      when(ratioC.isNotNull, h < (ratioC * (1L << 32)).cast("long"))
        .when(rateC.isNotNull, pmod(h, rateC) === 0L)
        .otherwise(pmod(h, lit(staticRate.toLong)) === 0L)
    val label =
      when(ratioC.isNotNull, ratioC.cast("string"))
        .when(rateC.isNotNull, rateC.cast("string"))
        .otherwise(lit(staticRate.toString))
    val kept = df.filter(exclude.map(e => e || keep).getOrElse(keep))
    sampleRateKey.filter(_.nonEmpty)
      .map(k => kept.withColumn(k, label)).getOrElse(kept)
  }

  /** Stratified sampling to a target mix (beyond the reference: the
    * training-data "source mix" construction step — e.g. keep 80% of
    * web, 100% of books, 5% of logs). Per-stratum deterministic hash
    * sampling: a row is kept iff the first SIX md5 hex chars of its key
    * (a 24-bit bucket, 16,777,216 values) fall under
    * floor(fraction * 2^24), so fractions are exact to ~6e-8 — real
    * training mixes routinely want 0.1%-of-a-huge-stratum slices, which
    * an 8-bit bucket would round to zero. Resampling with the same key
    * column is reproducible and monotone (floor keeps the kept set at f1
    * a subset of the kept set at f2>f1 — the property curriculum
    * re-mixes rely on). A null key coalesces to the empty-string bucket
    * instead of silently dropping the row. Pure filter: no shuffle,
    * pushes to the scan; strata absent from `fractions` drop.
    */
  def stratified(df: DataFrame, stratum: Column, key: Column,
                 fractions: Map[String, Double],
                 rateField: String = "sample_rate"): DataFrame = {
    val bucket = conv(
      substring(md5(coalesce(key.cast("string"), lit(""))), 1, 6), 16, 10)
      .cast("long")
    val frac = fractions.foldLeft(lit(null).cast("double")) {
      case (acc, (s, f)) => when(stratum === s, lit(f)).otherwise(acc)
    }
    df.withColumn("__frac", frac)
      .filter(col("__frac").isNotNull &&
        bucket < floor(col("__frac") * (1L << 24)).cast("long"))
      .withColumn(rateField, col("__frac")).drop("__frac")
  }

  /** Token-budget training-mix sampling: per stratum, take documents in
    * deterministic md5(key) order until the cumulative token count
    * reaches the stratum's budget (a doc is kept only if it fits
    * ENTIRELY — the standard budgeted-mix cut). Real mixes are specified
    * in tokens, not fractions ("200B tokens of web, 30B of code"), so
    * this is the op that turns those specs into a concrete doc set.
    *
    * Determinism + monotonicity: the hash order is stable across runs
    * and machines, and raising a budget only APPENDS docs to the kept
    * prefix — the same property curriculum re-mixes rely on in
    * [[stratified]]. Strata absent from `budgets` drop.
    *
    * Scale: one hash-partitioned window per stratum (sort by the 128-bit
    * key hash inside each partition); no driver state, no collect. For
    * corpora where single strata skew huge, the window sort is the
    * bottleneck — pre-filtering with [[stratified]] at an over-estimate
    * fraction and budgeting the survivors bounds the sort input.
    */
  def tokenBudget(df: DataFrame, stratum: Column, key: Column,
                  tokens: Column, budgets: Map[String, Long],
                  cumField: String = "cum_tokens"): DataFrame = {
    val budget = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (s, b)) => when(stratum === s, lit(b)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(md5(key.cast("string")), key.cast("string"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__budget", budget)
      .withColumn(cumField, sum(tokens).over(w))
      .filter(col("__budget").isNotNull && col(cumField) <= col("__budget"))
      .drop("__budget")
  }

  /** Count-based 1-in-`rate` per group (the reference's `group_by` mode:
    * an independent counter per group key, transform.rs). Batch form:
    * deterministic rank within (group, orderCol); the streaming
    * cross-batch counter lives in StatefulKernels.sampleCount.
    */
  def countPerGroup(df: DataFrame, group: Column, orderCol: Column,
                    rate: Int, rateField: String = "sample_rate"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(pmod(col("__rn") - 1, lit(rate)) === 0)
      .drop("__rn")
      .withColumn(rateField, lit(rate))
  }

  /** Temperature-weighted source mixing — the multilingual/multi-domain
    * sampling rule (exponentiated sampling as in mBERT/XLM-R; the
    * motivation behind UniMax): source s with n_s docs gets weight
    * w_s = n_s^alpha / Σ_t n_t^alpha (alpha = 1/temperature; alpha < 1
    * up-weights small sources), and a total budget of
    * floor(budgetFraction·N) docs allocates fraction
    * f_s = min(1, B·w_s / n_s) to each source, drawn with the
    * deterministic monotone md5 sampler ([[stratified]]).
    *
    * Scale shape: sizes are ONE count aggregation (the driver holds
    * |sources| rows); the draw is a pure filter that pushes to the
    * scan. Engine-parity determinism: fractions round to 6 decimals,
    * the weight denominator folds in source-name order (float addition
    * is order-sensitive), and the default alpha=0.5 uses sqrt — exactly
    * rounded by IEEE 754 in every engine, unlike a general pow.
    */
  def temperatureMix(df: DataFrame, stratum: Column, key: Column,
                     budgetFraction: Double, alpha: Double = 0.5,
                     rateField: String = "sample_rate"): DataFrame = {
    val counts = df.groupBy(stratum.as("__s")).count()
      .collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1))
      .sortBy(_._1)
    val total = counts.map(_._2).sum
    val budget = math.floor(total * budgetFraction)
    def weight(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble)
      else math.pow(n.toDouble, alpha)
    val denom = counts.foldLeft(0.0) { case (acc, (_, n)) =>
      acc + weight(n) }
    val fractions = counts.map { case (s, n) =>
      s -> BigDecimal(math.min(1.0, budget * (weight(n) / denom) / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    stratified(df, stratum, key, fractions, rateField)
  }
}
