package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Learned document classifiers for corpus curation — the trainable
  * counterpart to TextAnalysis's heuristic language-id and quality
  * scores. Multinomial Naive Bayes in closed form: training is counting,
  * so the whole fit is two aggregations, no iterative optimizer, and the
  * result is exactly reproducible by any SQL engine (the oracle replays
  * it in DuckDB).
  *
  * Scale shape (the 100 TB posture):
  *  - Tokenize-and-explode is the only row-multiplying step; both the
  *    vocabulary and the per-class token counts come out of ONE
  *    hash-partitioned groupBy each, with map-side partial aggregation.
  *  - The fitted model is a top-V vocabulary × C classes table — bounded
  *    by construction (V·C rows), so scoring BROADCASTS the model and
  *    the corpus is never shuffled on a model key: explode → broadcast
  *    join → one groupBy(doc) for the per-class score sums.
  *  - Everything downstream of the explode is codegen'd Column algebra;
  *    no UDFs anywhere.
  *
  * Determinism for engine parity: vocabulary ties break by token text,
  * log-probabilities are rounded to 6 dp before scoring, scores to 4 dp,
  * and the argmax tie-breaks to the lexicographically smallest class.
  */
object Classifier {

  /** Fit multinomial NB on `train` and score `test`.
    *
    * Returns one row per test doc: (id, pred, score) where score is the
    * winning class's log-likelihood (4 dp). Unknown tokens (outside the
    * top-`vocabSize` training vocabulary) are ignored — the standard
    * bounded-vocab practice that keeps the model broadcastable.
    */
  def naiveBayes(train: DataFrame, test: DataFrame, id: String,
                 text: Column, label: Column,
                 vocabSize: Int = 2000): DataFrame = {
    val spark = train.sparkSession
    val tr = train.select(col(id).as("_id"), label.as("_cls"),
      Dedup.tokens(text).as("_toks"))
    val te = test.select(col(id).as("_id"), Dedup.tokens(text).as("_toks"))

    // class priors: log(docs_c / docs). The class table is C rows —
    // bounded by construction — so COLLECT it once and rebuild it as a
    // local relation: nTrain is then a driver-side sum (the separate
    // tr.count() scan disappears) and the final plan's references to
    // `classes` cost nothing instead of re-aggregating the corpus.
    val clsType = tr.schema("_cls").dataType
    val classRows = tr.groupBy("_cls").agg(count(lit(1)).as("n_docs"))
      .collect()
    val nTrain = classRows.map(_.getLong(1)).sum.toDouble
    val classes = spark.createDataFrame(
      java.util.Arrays.asList(classRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_cls", clsType),
        org.apache.spark.sql.types.StructField("n_docs",
          org.apache.spark.sql.types.LongType))))
    val priors = classes.select(col("_cls"),
      round(log(col("n_docs") / nTrain), 6).as("prior"))

    // token occurrences in training docs (one explode, reused twice)
    val occ = tr.select(col("_cls"), explode(col("_toks")).as("tok"))

    // vocabulary: top-V tokens by total occurrence count, ties by token —
    // limit() is TakeOrderedAndProject (distributed top-K, per-partition
    // heads merged on the driver), NOT a global sort. V is bounded by
    // construction (that is the point of the cut), so collect it and
    // reuse the local relation: the previous in-plan vocab subtree
    // re-ran the corpus explode once for vSize and once more per
    // downstream reference.
    val vocabRows = occ.groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(vocabSize).select("tok")
      .collect()
    val vocab = spark.createDataFrame(
      java.util.Arrays.asList(vocabRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tok",
          org.apache.spark.sql.types.StringType))))

    // per-class token counts over the vocab + add-one smoothing.
    // The (class × vocab) grid must be DENSE: a vocab token never seen
    // in class c still contributes log(1/(total_c+V)) when a test doc
    // contains it, so cross-join the grid and left-join the counts.
    // The observed-count table is ≤ C×V rows — bounded by construction —
    // so COLLECT it once like the class/vocab tables: the corpus explode
    // runs exactly once (totals becomes a local re-aggregation, not a
    // second corpus pass) and the model-assembly joins are local-vs-
    // local (no SortMergeJoin of a corpus subtree against the grid).
    val countRows = occ.join(vocab, Seq("tok")).groupBy("_cls", "tok")
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val counts = spark.createDataFrame(
      java.util.Arrays.asList(countRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_cls", clsType),
        org.apache.spark.sql.types.StructField("tok",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType))))
    val totals = counts.groupBy("_cls").agg(sum(col("cnt")).as("total_c"))
    val vSize = vocabRows.length.toLong
    val grid = classes.select("_cls").crossJoin(vocab)
    val logp = grid
      .join(counts, Seq("_cls", "tok"), "left")
      .join(broadcast(totals), Seq("_cls"))
      .select(col("_cls"), col("tok"),
        round(log((coalesce(col("cnt"), lit(0L)) + 1.0) /
          (col("total_c") + lit(vSize.toDouble))), 6).as("logp"))

    // score: explode test tokens, broadcast-join the model, one
    // groupBy(doc, class) sum, then argmax with smallest-class tie-break
    val scored = te.select(col("_id"), explode(col("_toks")).as("tok"))
      .join(broadcast(logp), Seq("tok"))
      .groupBy("_id", "_cls").agg(sum(col("logp")).as("ll"))
      .join(broadcast(priors), Seq("_cls"))
      .withColumn("score", round(col("prior") + col("ll"), 4))
    val w = Window.partitionBy(col("_id"))
      .orderBy(col("score").desc, col("_cls"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("_id").as(id), col("_cls").as("pred"), col("score"))
  }

  /** Bigram language-model perplexity — the KenLM/CCNet-style quality
    * filter: train an add-one-smoothed bigram LM on `train`, score each
    * `test` doc by per-bigram negative log-likelihood (perplexity =
    * exp(nll)). High-perplexity docs are "unnatural" under the corpus
    * distribution and get filtered from training mixes.
    *
    * Closed form again: training is counting (bigram counts + their
    * first-token marginals over a bounded top-V vocabulary, out-of-vocab
    * tokens collapsing to `<unk>`), so the DuckDB oracle replays the fit
    * exactly. Scale shape: tokens explode once with position; the vocab
    * map and both count tables broadcast (V and V·V-observed bounded);
    * bigram assembly is one `lead()` window per doc — a single hash
    * shuffle on doc id, which the per-doc aggregation then reuses.
    *
    * Engine parity: log-probs rounded to 6 dp, per-doc nll to 4 before
    * exp, smallest-token tie-break in the vocabulary cut.
    */
  def bigramPerplexity(train: DataFrame, test: DataFrame, id: String,
                       text: Column, vocabSize: Int = 2000): DataFrame = {
    def toks(df: DataFrame) = df.select(col(id).as("_id"),
      posexplode(Dedup.tokens(text)).as(Seq("pos", "w")))
    val trTok = toks(train)

    // the top-V cut is bounded by construction: collect it once and use
    // a local relation — the in-plan vocab subtree previously re-ran
    // the train-token explode for vEff and once per mapped() reference
    val vocabRows = trTok.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(vocabSize).select("w")
      .collect()
    val vocab = train.sparkSession.createDataFrame(
      java.util.Arrays.asList(vocabRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.StringType))))
    // effective vocabulary = kept tokens + <unk>
    val vEff = vocabRows.length.toDouble + 1.0

    def mapped(tok: DataFrame) = tok
      .join(broadcast(vocab.withColumn("known", lit(true))), Seq("w"), "left")
      .withColumn("wm", when(col("known"), col("w")).otherwise(lit("<unk>")))
    def bigrams(tok: DataFrame) = {
      val w = Window.partitionBy("_id").orderBy("pos")
      mapped(tok)
        .withColumn("w2", lead(col("wm"), 1).over(w))
        .filter(col("w2").isNotNull)
        .select(col("_id"), col("wm").as("w1"), col("w2"))
    }

    // bc feeds BOTH broadcast(bc) and wt's re-aggregation in the final
    // plan — persist so the train bigram window runs once per action,
    // not twice (bc is V×V-observed bounded, already broadcast-sized
    // by the existing design)
    val bc = bigrams(trTok).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .persist()
    val wt = bc.groupBy("w1").agg(sum(col("c2")).as("c1"))

    val scored = bigrams(toks(test))
      .join(broadcast(bc), Seq("w1", "w2"), "left")
      .join(broadcast(wt), Seq("w1"), "left")
      .withColumn("logp", round(
        log((coalesce(col("c2"), lit(0L)) + 1.0) /
          (coalesce(col("c1"), lit(0L)) + lit(vEff))), 6))
    scored.groupBy("_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(col("logp")) / count(lit(1)), 4).as("nll"))
      .withColumn("ppl", round(exp(col("nll")), 4))
      .select(col("_id").as(id), col("n_bigrams"), col("nll"), col("ppl"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each raw doc
    * by log p_target(x)/p_raw(x) under bag-of-hashed-bigram unigram
    * models — docs that look like the target domain get high weights and
    * survive the resampling cut.
    *
    * Hashed features sidestep vocabulary management entirely: a bigram
    * maps to one of `buckets` ids via the 24-bit md5 prefix (the
    * engine-portable hash the shard/sampling ops already use), so BOTH
    * distributions are dense bounded vectors that fit in a broadcast no
    * matter the corpus size. Fitting is one groupBy(bucket) per side;
    * scoring is explode → broadcast join → one groupBy(doc). Add-one
    * smoothing keeps unseen buckets finite; log-ratios round to 6 dp and
    * doc weights to 4 for engine parity.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, id: String,
                        text: Column, buckets: Int = 4096): DataFrame = {
    def grams(df: DataFrame, cols: Column*) = {
      val toks = Dedup.tokens(text)
      // zip tokens with their successors; the zip's trailing (w_n, null)
      // pair must become null (not a stray unigram via concat_ws's
      // null-skipping), then filter out
      df.select(cols :+ filter(
        zip_with(toks, slice(toks, 2, 100000),
          (a, b) => when(b.isNotNull, concat(a, lit(" "), b))),
        g => g.isNotNull).as("_gs"): _*)
    }
    def bucketed(df: DataFrame, cols: Column*) = {
      val g = grams(df, cols: _*)
      val keep = g.columns.filter(_ != "_gs").map(col).toSeq
      g.select(keep :+ explode(col("_gs")).as("_g"): _*)
        .withColumn("b", pmod(
          conv(substring(md5(col("_g")), 1, 6), 16, 10).cast("long"),
          lit(buckets)))
    }

    // each distribution is <= `buckets` rows — bounded by construction
    // (the whole point of hashed features) — so collect ONCE per side:
    // the totals become driver sums and the ratio table below joins
    // local relations, instead of four separate full gram-explode scans
    // (two .agg().head() totals + the final plan re-running both dists)
    def dist(df: DataFrame): Array[org.apache.spark.sql.Row] =
      bucketed(df).groupBy("b").agg(count(lit(1)).as("c")).collect()
    def localDist(rows: Array[org.apache.spark.sql.Row]): DataFrame =
      raw.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("b",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("c",
            org.apache.spark.sql.types.LongType))))
    val tRows = dist(target)
    val rRows = dist(raw)
    val tCounts = localDist(tRows)
    val rCounts = localDist(rRows)
    val tTotal = tRows.map(_.getLong(1)).sum.toDouble
    val rTotal = rRows.map(_.getLong(1)).sum.toDouble
    // dense log-ratio table: every bucket present (unseen buckets carry
    // the smoothed floor), so scoring needs no outer-join fallback logic
    val ratio = raw.sparkSession.range(buckets).select(col("id").as("b"))
      .join(tCounts.withColumnRenamed("c", "ct"), Seq("b"), "left")
      .join(rCounts.withColumnRenamed("c", "cr"), Seq("b"), "left")
      .select(col("b"), round(
        log((coalesce(col("ct"), lit(0L)) + 1.0) / (tTotal + buckets)) -
          log((coalesce(col("cr"), lit(0L)) + 1.0) / (rTotal + buckets)),
        6).as("lr"))

    // decimal sum: lr values are exact 6-dp decimals, so a decimal
    // accumulator is associative — any partitioning yields the identical
    // sum, and the 4-dp round can't flip on summation-order fp noise
    bucketed(raw, col(id).as("_id"))
      .join(broadcast(ratio), Seq("b"))
      .groupBy("_id")
      .agg(count(lit(1)).as("n_grams"),
        round(sum(col("lr").cast("decimal(18,6)")), 4).cast("double")
          .as("log_weight"))
      .select(col("_id").as(id), col("n_grams"), col("log_weight"))
  }
}
